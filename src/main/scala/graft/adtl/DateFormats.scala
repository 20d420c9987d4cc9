package graft.adtl

/** strftime(3) → Java DateTimeFormatter pattern translation.
  * adtl specs express all date formats in strftime conventions
  * (/root/reference/src/adtl/get_value.py:219-234); Spark's datetime
  * functions take Java patterns, so specs are translated once at compile
  * time.
  *
  * Parse and format need DIFFERENT patterns: Python's strptime accepts
  * non-zero-padded fields ("5/3/2022" parses with %d/%m/%Y), which Java
  * matches only with single-letter lenient patterns ("d/M/y"), while
  * strftime OUTPUT is zero-padded, which Java matches with the wide forms
  * ("dd/MM/yyyy").
  *
  * `twoDigitYear` records %y presence: Java's "yy" pivots 00-99 →
  * 2000-2099 while Python's strptime pivots 69-99 → 1969-1999, so compiled
  * plans subtract 100 years from parses landing in 2069+ to match.
  */
object DateFormats {

  final case class Translated(parsePattern: String, formatPattern: String,
      twoDigitYear: Boolean) {
    /** Backwards-compatible accessor: the strict/padded output pattern. */
    def javaPattern: String = formatPattern
  }

  /** directive → (lenient parse form, padded format form) */
  private val map: Map[Char, (String, String)] = Map(
    'Y' -> ("y", "yyyy"), 'y' -> ("yy", "yy"),
    'm' -> ("M", "MM"), 'd' -> ("d", "dd"),
    'H' -> ("H", "HH"), 'I' -> ("h", "hh"),
    'M' -> ("m", "mm"), 'S' -> ("s", "ss"),
    'b' -> ("MMM", "MMM"), 'B' -> ("MMMM", "MMMM"),
    'a' -> ("EEE", "EEE"), 'A' -> ("EEEE", "EEEE"),
    'j' -> ("D", "DDD"), 'p' -> ("a", "a"),
    'z' -> ("xx", "xx"), 'f' -> ("SSSSSS", "SSSSSS"),
    '%' -> ("%", "%"))

  def translate(strftime: String): Translated = {
    val parse = new StringBuilder
    val format = new StringBuilder
    var twoDigit = false
    var i = 0
    var literal = new StringBuilder
    def flushLiteral(): Unit = {
      if (literal.nonEmpty) {
        val s = literal.toString
        val rendered =
          if (s.exists(_.isLetter)) "'" + s.replace("'", "''") + "'" else s
        parse.append(rendered)
        format.append(rendered)
        literal = new StringBuilder
      }
    }
    while (i < strftime.length) {
      val c = strftime.charAt(i)
      if (c == '%' && i + 1 < strftime.length) {
        val d = strftime.charAt(i + 1)
        map.get(d) match {
          case Some((p, f)) =>
            flushLiteral()
            if (d == 'y') twoDigit = true
            parse.append(p)
            format.append(f)
          case None =>
            throw new IllegalArgumentException(s"Unsupported strftime directive %$d in '$strftime'")
        }
        i += 2
      } else { literal.append(c); i += 1 }
    }
    flushLiteral()
    Translated(parse.toString, format.toString, twoDigit)
  }
}

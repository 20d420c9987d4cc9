package graft.adtl

/** strftime(3) → Java DateTimeFormatter pattern translation.
  * adtl specs express all date formats in strftime conventions
  * (/root/reference/src/adtl/get_value.py:219-234); Spark's datetime
  * functions take Java patterns, so specs are translated once at compile
  * time. `twoDigitYear` records %y presence: Java's "yy" pivots 00-99 →
  * 2000-2099 while Python's strptime pivots 69-99 → 1969-1999, so compiled
  * plans subtract 100 years from parses landing in 2069+ to match.
  */
object DateFormats {

  final case class Translated(javaPattern: String, twoDigitYear: Boolean)

  private val map: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
    'b' -> "MMM", 'B' -> "MMMM", 'a' -> "EEE", 'A' -> "EEEE",
    'j' -> "DDD", 'p' -> "a", 'z' -> "xx", 'f' -> "SSSSSS",
    '%' -> "%")

  def translate(strftime: String): Translated = {
    val sb = new StringBuilder
    var twoDigit = false
    var i = 0
    var literal = new StringBuilder
    def flushLiteral(): Unit = {
      if (literal.nonEmpty) {
        val s = literal.toString
        if (s.exists(_.isLetter)) sb.append("'").append(s.replace("'", "''")).append("'")
        else sb.append(s)
        literal = new StringBuilder
      }
    }
    while (i < strftime.length) {
      val c = strftime.charAt(i)
      if (c == '%' && i + 1 < strftime.length) {
        val d = strftime.charAt(i + 1)
        map.get(d) match {
          case Some(j) =>
            flushLiteral()
            if (d == 'y') twoDigit = true
            sb.append(j)
          case None =>
            throw new IllegalArgumentException(s"Unsupported strftime directive %$d in '$strftime'")
        }
        i += 2
      } else { literal.append(c); i += 1 }
    }
    flushLiteral()
    Translated(sb.toString, twoDigit)
  }
}

package graft.adtl

import scala.collection.mutable

/** Minimal TOML v1.0 parser covering the subset adtl specification files use
  * (cf. the reference's tests/test_adtl/parsers TOML corpus): tables, arrays of
  * tables, dotted/quoted keys, basic/literal/multiline strings, integers,
  * floats, booleans, (possibly multiline) arrays, inline tables, comments.
  * Produces order-preserving Map[String, Any] / List[Any] trees — entry order
  * matters for oneToMany match blocks.
  *
  * No external TOML library ships with the Spark jars, hence hand-rolled.
  */
object TomlParser {

  final class TomlParseException(msg: String) extends RuntimeException(msg)

  type Doc = mutable.LinkedHashMap[String, Any]

  def parse(text: String): Map[String, Any] = {
    val p = new Parser(text)
    p.parseDocument()
  }

  def parseFile(path: String): Map[String, Any] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    var s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    if (s.nonEmpty && s.charAt(0) == '﻿') s = s.substring(1)
    parse(s)
  }

  /** Recursively freeze mutable maps into immutable order-preserving ones. */
  private def freeze(v: Any): Any = v match {
    case m: Doc => scala.collection.immutable.VectorMap.from(m.map { case (k, x) => k -> freeze(x) })
    case l: mutable.ArrayBuffer[_] => l.map(freeze).toList
    case l: List[_] => l.map(freeze)
    case other => other
  }

  private final class Parser(s: String) {
    private var i = 0
    private val root: Doc = new Doc
    // current insertion target ([table] header changes it)
    private var current: Doc = root
    // paths already defined as arrays-of-tables
    private val arrayTables = mutable.Set[List[String]]()

    def parseDocument(): Map[String, Any] = {
      skipWsAndComments(newlines = true)
      while (i < s.length) {
        if (s.charAt(i) == '[') parseHeader()
        else parseKeyValue(current)
        skipToLineEnd()
        skipWsAndComments(newlines = true)
      }
      freeze(root).asInstanceOf[Map[String, Any]]
    }

    private def err(msg: String): Nothing = {
      val line = s.substring(0, math.min(i, s.length)).count(_ == '\n') + 1
      throw new TomlParseException(s"TOML parse error at line $line: $msg")
    }

    private def skipWsAndComments(newlines: Boolean): Unit = {
      var done = false
      while (!done && i < s.length) {
        val c = s.charAt(i)
        if (c == ' ' || c == '\t' || c == '\r') i += 1
        else if (c == '\n' && newlines) i += 1
        else if (c == '#') { while (i < s.length && s.charAt(i) != '\n') i += 1 }
        else done = true
      }
    }

    /** After a statement: only whitespace/comment allowed until newline. */
    private def skipToLineEnd(): Unit = {
      skipWsAndComments(newlines = false)
      if (i < s.length) {
        if (s.charAt(i) == '\n') i += 1
        else err(s"unexpected trailing content: '${s.charAt(i)}'")
      }
    }

    private def parseHeader(): Unit = {
      i += 1 // '['
      val isArray = i < s.length && s.charAt(i) == '['
      if (isArray) i += 1
      val path = parseDottedKey(insideHeader = true)
      if (isArray) {
        expect(']'); expect(']')
        val parent = descend(root, path.init, createTables = true)
        val arr = parent.get(path.last) match {
          case Some(a: mutable.ArrayBuffer[Any] @unchecked) => a
          case None =>
            val a = new mutable.ArrayBuffer[Any]
            parent(path.last) = a; a
          case Some(_) => err(s"key ${path.mkString(".")} is not an array of tables")
        }
        val t = new Doc
        arr += t
        arrayTables += path
        current = t
      } else {
        expect(']')
        val parent = descend(root, path.init, createTables = true)
        val t = parent.get(path.last) match {
          case Some(existing: Doc) => existing
          case None =>
            val t = new Doc
            parent(path.last) = t; t
          case Some(_) => err(s"key ${path.mkString(".")} already defined as non-table")
        }
        current = t
      }
    }

    /** Walk/create intermediate tables; last element of an array-of-tables
      * becomes the target when an intermediate path segment names one. */
    private def descend(from: Doc, path: List[String], createTables: Boolean): Doc = {
      var cur = from
      for (seg <- path) {
        cur = cur.get(seg) match {
          case Some(t: Doc) => t
          case Some(a: mutable.ArrayBuffer[Any] @unchecked) if a.nonEmpty =>
            a.last.asInstanceOf[Doc]
          case None if createTables =>
            val t = new Doc
            cur(seg) = t; t
          case other => err(s"cannot descend into $seg ($other)")
        }
      }
      cur
    }

    private def expect(c: Char): Unit = {
      skipWsAndComments(newlines = false)
      if (i >= s.length || s.charAt(i) != c) err(s"expected '$c'")
      i += 1
    }

    private def parseDottedKey(insideHeader: Boolean): List[String] = {
      val parts = mutable.ListBuffer[String]()
      var done = false
      while (!done) {
        skipWsAndComments(newlines = false)
        parts += parseKeyPart()
        skipWsAndComments(newlines = false)
        if (i < s.length && s.charAt(i) == '.') i += 1 else done = true
      }
      parts.toList
    }

    private def parseKeyPart(): String = {
      if (i >= s.length) err("expected key")
      s.charAt(i) match {
        case '"' => parseBasicString()
        case '\'' => parseLiteralString()
        case _ =>
          val start = i
          while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '-')) i += 1
          if (i == start) err(s"invalid key character '${s.charAt(i)}'")
          s.substring(start, i)
      }
    }

    private def parseKeyValue(target: Doc): Unit = {
      val path = parseDottedKey(insideHeader = false)
      skipWsAndComments(newlines = false)
      if (i >= s.length || s.charAt(i) != '=') err("expected '=' after key")
      i += 1
      skipWsAndComments(newlines = false)
      val v = parseValue()
      val parent = descend(target, path.init, createTables = true)
      if (parent.contains(path.last)) err(s"duplicate key ${path.mkString(".")}")
      parent(path.last) = v
    }

    private def parseValue(): Any = {
      if (i >= s.length) err("expected value")
      s.charAt(i) match {
        case '"' if s.startsWith("\"\"\"", i) => parseMultilineBasic()
        case '\'' if s.startsWith("'''", i) => parseMultilineLiteral()
        case '"' => parseBasicString()
        case '\'' => parseLiteralString()
        case '[' => parseArray()
        case '{' => parseInlineTable()
        case 't' if s.startsWith("true", i) => i += 4; true
        case 'f' if s.startsWith("false", i) => i += 5; false
        case _ => parseNumberOrDate()
      }
    }

    private def parseBasicString(): String = {
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\n') err("newline in basic string")
        if (c == '\\') {
          i += 1
          if (i >= s.length) err("dangling escape")
          s.charAt(i) match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case 'u' =>
              val hex = s.substring(i + 1, i + 5); i += 4
              sb += Integer.parseInt(hex, 16).toChar
            case 'U' =>
              val hex = s.substring(i + 1, i + 9); i += 8
              sb.appendAll(Character.toChars(Integer.parseInt(hex, 16)))
            case other => err(s"unknown escape \\$other")
          }
          i += 1
        } else { sb += c; i += 1 }
      }
      if (i >= s.length) err("unterminated string")
      i += 1
      sb.toString
    }

    private def parseLiteralString(): String = {
      i += 1
      val start = i
      while (i < s.length && s.charAt(i) != '\'') {
        if (s.charAt(i) == '\n') err("newline in literal string")
        i += 1
      }
      if (i >= s.length) err("unterminated literal string")
      val out = s.substring(start, i)
      i += 1
      out
    }

    private def parseMultilineBasic(): String = {
      i += 3
      if (i < s.length && s.charAt(i) == '\n') i += 1
      val sb = new StringBuilder
      while (i < s.length && !s.startsWith("\"\"\"", i)) {
        val c = s.charAt(i)
        if (c == '\\') {
          // line-ending backslash trims whitespace; simple escapes as above
          if (i + 1 < s.length && (s.charAt(i + 1) == '\n' || s.charAt(i + 1) == '\r')) {
            i += 1
            while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' || s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
          } else {
            i += 1
            s.charAt(i) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
              case '"' => sb += '"'; case '\\' => sb += '\\'
              case other => err(s"unknown escape \\$other")
            }
            i += 1
          }
        } else { sb += c; i += 1 }
      }
      if (i >= s.length) err("unterminated multiline string")
      i += 3
      sb.toString
    }

    private def parseMultilineLiteral(): String = {
      i += 3
      if (i < s.length && s.charAt(i) == '\n') i += 1
      val start = i
      while (i < s.length && !s.startsWith("'''", i)) i += 1
      if (i >= s.length) err("unterminated multiline literal")
      val out = s.substring(start, i)
      i += 3
      out
    }

    private def parseArray(): List[Any] = {
      i += 1
      val items = mutable.ListBuffer[Any]()
      var done = false
      while (!done) {
        skipWsAndComments(newlines = true)
        if (i < s.length && s.charAt(i) == ']') { i += 1; done = true }
        else {
          items += parseValue()
          skipWsAndComments(newlines = true)
          if (i < s.length && s.charAt(i) == ',') i += 1
          else if (i < s.length && s.charAt(i) == ']') { i += 1; done = true }
          else err("expected ',' or ']' in array")
        }
      }
      items.toList
    }

    private def parseInlineTable(): Doc = {
      i += 1
      val t = new Doc
      skipWsAndComments(newlines = false)
      if (i < s.length && s.charAt(i) == '}') { i += 1; return t }
      var done = false
      while (!done) {
        skipWsAndComments(newlines = false)
        parseKeyValue(t)
        skipWsAndComments(newlines = false)
        if (i < s.length && s.charAt(i) == ',') i += 1
        else if (i < s.length && s.charAt(i) == '}') { i += 1; done = true }
        else err("expected ',' or '}' in inline table")
      }
      t
    }

    private def parseNumberOrDate(): Any = {
      val start = i
      while (i < s.length && !",]}# \t\r\n".contains(s.charAt(i))) i += 1
      val tok = s.substring(start, i)
      if (tok.isEmpty) err("expected value")
      // dates and times kept as strings (adtl treats them as strings anyway)
      if (tok.exists(c => c == ':' || (c == '-' && tok.indexOf('-') > 0))
          && !tok.matches("[-+]?[0-9_]+(\\.[0-9_]+)?([eE][-+]?[0-9]+)?")) {
        tok
      } else {
        val clean = tok.replace("_", "")
        if (clean.matches("[-+]?[0-9]+")) clean.toLong
        else if (clean.matches("[-+]?([0-9]+\\.[0-9]*|\\.[0-9]+|[0-9]+)([eE][-+]?[0-9]+)?") &&
          (clean.contains('.') || clean.toLowerCase.contains('e'))) clean.toDouble
        else if (clean == "inf" || clean == "+inf") Double.PositiveInfinity
        else if (clean == "-inf") Double.NegativeInfinity
        else if (clean == "nan" || clean == "+nan" || clean == "-nan") Double.NaN
        else err(s"cannot parse value: '$tok'")
      }
    }
  }
}

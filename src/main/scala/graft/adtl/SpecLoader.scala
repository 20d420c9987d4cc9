package graft.adtl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node._
import scala.jdk.CollectionConverters._

/** Loads adtl specification documents (JSON or TOML) into order-preserving
  * Map[String, Any] / List[Any] trees — the raw spec representation the
  * normalizer and compiler operate on.
  * Mirrors read_file dispatch (/root/reference/src/adtl/parser.py:183-194).
  */
object SpecLoader {
  private val mapper = new ObjectMapper()

  def fromJsonNode(n: JsonNode): Any = n match {
    case o: ObjectNode =>
      // fieldNames(), not properties(): as of Jackson 2.21 properties()
      // returns an UNORDERED set copy, silently shuffling spec/schema key
      // order; fieldNames() iterates document order
      scala.collection.immutable.VectorMap.from(
        o.fieldNames().asScala.map(k => k -> fromJsonNode(o.get(k))))
    case a: ArrayNode => a.elements().asScala.map(fromJsonNode).toList
    case t: TextNode => t.textValue()
    case b: BooleanNode => b.booleanValue()
    case _: NullNode => null
    case num: NumericNode =>
      if (num.isIntegralNumber) num.longValue() else num.doubleValue()
    case other => other.asText()
  }

  def parseJson(text: String): Map[String, Any] =
    fromJsonNode(mapper.readTree(text)).asInstanceOf[Map[String, Any]]

  def loadFile(path: String): Map[String, Any] = {
    val p = path.toLowerCase
    if (p.endsWith(".json")) parseJson(readUtf8(path))
    else if (p.endsWith(".toml")) TomlParser.parseFile(path)
    else throw new IllegalArgumentException(s"Unsupported file format: $path")
  }

  def readUtf8(path: String): String = {
    var s = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    if (s.nonEmpty && s.charAt(0) == '﻿') s = s.substring(1)
    s
  }

  /** Canonical JSON rendering with sorted keys — matches Python's
    * json.dumps(obj, sort_keys=True) including ", "/": " separators, for
    * uuid5 namespace parity (/root/reference/src/adtl/parser.py:357-361).
    */
  def canonicalJson(v: Any): String = v match {
    case null => "null"
    case b: Boolean => if (b) "true" else "false"
    case s: String => quoteJson(s)
    case l: Long => l.toString
    case i: Int => i.toString
    case d: Double =>
      if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e16) s"${d.toLong}.0"
      else d.toString
    case m: Map[String, Any] @unchecked =>
      m.toSeq.sortBy(_._1).map { case (k, x) => s"${quoteJson(k)}: ${canonicalJson(x)}" }
        .mkString("{", ", ", "}")
    case l: Seq[Any] @unchecked => l.map(canonicalJson).mkString("[", ", ", "]")
    case other => quoteJson(other.toString)
  }

  private def quoteJson(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      // json.dumps defaults to ensure_ascii=True: every non-ASCII char is
      // \u-escaped (astral chars as UTF-16 surrogate pairs, which Scala's
      // per-char iteration yields natively)
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }
}

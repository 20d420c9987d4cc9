package graft.adtl.autoparser

import graft.adtl.Spec.Raw

/** Deterministic half of the autoparser pipeline (G5): turn a field-mapping
  * table (source field → target field, optional value map) into a runnable
  * TOML specification. Mirrors the shape of the reference's ParserGenerator
  * / make_toml (/root/reference/src/adtl/autoparser/make_toml.py; studied,
  * not copied): repeated value maps are hoisted into shared `defs` and
  * referenced with `ref`. The LLM mapping stages are out of engine scope —
  * this consumes their output table.
  */
object SpecGenerator {

  final case class FieldMapping(
      targetField: String,
      sourceField: String,
      valueMap: Map[String, String] = Map.empty,
      sensitive: Boolean = false)

  /** Build the raw spec tree for a single oneToOne table. Value maps that
    * recur across `minRefCount`+ fields become shared defs. */
  def generate(
      name: String, description: String, tableName: String,
      mappings: Seq[FieldMapping], minRefCount: Int = 2): Raw = {
    val mapCounts = mappings.filter(_.valueMap.nonEmpty)
      .groupBy(_.valueMap).view.mapValues(_.size).toMap
    val refNames: Map[Map[String, String], String] = mapCounts
      .filter(_._2 >= minRefCount).keys.toList
      .sortBy(m => m.toSeq.sorted.mkString(","))
      .zipWithIndex.map { case (m, i) => m -> s"map_${i + 1}" }.toMap

    val defs: Raw = refNames.map { case (m, rn) =>
      rn -> Map("values" -> (m: Any))
    }

    val fields: Raw = scala.collection.immutable.VectorMap.from(
      mappings.sortBy(_.targetField).map { fm =>
        var rule: Raw = Map("field" -> fm.sourceField)
        refNames.get(fm.valueMap) match {
          case Some(rn) => rule = rule + ("ref" -> rn)
          case None if fm.valueMap.nonEmpty => rule = rule + ("values" -> fm.valueMap)
          case None =>
        }
        if (fm.sensitive) rule = rule + ("sensitive" -> true)
        fm.targetField -> (rule: Any)
      })

    val header: Raw = {
      val base: Raw = scala.collection.immutable.VectorMap(
        "name" -> name, "description" -> description,
        "tables" -> Map(tableName -> Map("kind" -> "oneToOne")))
      if (defs.nonEmpty) base + ("defs" -> defs) else base
    }
    scala.collection.immutable.VectorMap("adtl" -> header, tableName -> fields)
  }

  /** Serialize a spec tree as TOML (the writer subset adtl specs need:
    * nested tables, inline value maps, arrays, scalars). */
  def toToml(spec: Raw): String = {
    val sb = new StringBuilder
    def inlineValue(v: Any): String = v match {
      case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case b: Boolean => b.toString
      case l: Long => l.toString
      case i: Int => i.toString
      case d: Double => d.toString
      case m: Raw @unchecked =>
        m.map { case (k, x) => s"${quoteKey(k)} = ${inlineValue(x)}" }
          .mkString("{ ", ", ", " }")
      case l: List[_] => l.map(inlineValue).mkString("[", ", ", "]")
      case other => inlineValue(other.toString)
    }
    def quoteKey(k: String): String =
      if (k.matches("[A-Za-z0-9_-]+")) k else "\"" + k.replace("\"", "\\\"") + "\""
    def writeTable(path: List[String], m: Raw): Unit = {
      val (scalars, tables) = m.partition {
        case (_, sub: Raw @unchecked) =>
          // nested maps containing only leaf-ish rules stay inline; pure
          // table-of-tables recurse
          !sub.values.exists(_.isInstanceOf[Map[_, _]]) && sub.size <= 6 || sub.contains("field")
        case _ => true
      }
      if (path.nonEmpty && (scalars.nonEmpty || m.isEmpty)) {
        sb.append(s"\n[${path.map(quoteKey).mkString(".")}]\n")
      }
      scalars.foreach { case (k, v) => sb.append(s"${quoteKey(k)} = ${inlineValue(v)}\n") }
      tables.foreach {
        case (k, sub: Raw @unchecked) => writeTable(path :+ k, sub)
        case _ =>
      }
    }
    writeTable(Nil, spec)
    sb.toString
  }
}

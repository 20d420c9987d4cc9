package graft.adtl.autoparser

import graft.adtl.{Spec, SpecLoader}
import Spec.Raw

/** Mapping-table → parser-spec generation (autoparser G5), faithful to the
  * reference's WideTableParser (/root/reference/src/adtl/autoparser/
  * make_toml.py:72-160 and util.py:49-88; studied, not copied):
  *
  *  - `value_mapping` strings ("oui=True | non=False | autre=None") parse
  *    to value maps with True/False/""-for-None coercions and bracketed
  *    lists split;
  *  - value maps repeated across fields are hoisted into shared defs: the
  *    first boolean map becomes the `Y/N/NK` ref, other repeated maps are
  *    named by joining their target values with '/';
  *  - per-field rules carry field + description, a ref or an inline
  *    caseInsensitive values map, and `type = enum_list` when the target
  *    schema type includes "array";
  *  - mapping rows without a source field are dropped, then any REQUIRED
  *    schema field still missing becomes an empty-string constant.
  */
object MappingParser {

  final case class MappingRow(
      targetField: String,
      sourceDescription: Option[String],
      sourceField: Option[String],
      valueMapping: Option[String])

  /** "a=b | c=d" → value map (util.py:49-88). */
  def parseMappedValues(s: String): Raw = {
    // split on '|' except inside [...] lists (incl. a trailing unclosed '[')
    // limit -1: re.split keeps trailing empty chunks, so "oui=True |" must
    // surface the empty segment and raise, as the reference does
    val parts = s.split("\\|(?!(?:[^\\[]*\\])|(?:[^\\[]*\\[[^\\]]*$))", -1).toList
    val pairs = parts.map { p =>
      val kv = p.trim.split("=", -1)
      if (kv.length != 2)
        throw new IllegalArgumentException(
          s"autoparser: Invalid choices list for value mapping ${kv.toList}")
      kv(0) -> kv(1)
    }
    val out = scala.collection.mutable.LinkedHashMap[String, Any]()
    pairs.foreach { case (k, v) =>
      val value: Option[Any] = v.toLowerCase match {
        case "true" => Some(true)
        case "false" => Some(false)
        case "none" => if (k.isEmpty) None else Some("")
        case "" if k.isEmpty => None
        // the reference's `if "[" and "]" in v` is Python truthiness for
        // `"]" in v` — ']' alone triggers list coercion (util.py:85)
        case _ if v.contains("]") =>
          Some(v.replaceAll("^[\\[\\]]+|[\\[\\]]+$", "")
            .replace(" ", "").split(",", -1).toList)
        case _ => Some(v)
      }
      value.foreach(out(k) = _)
    }
    out.toMap
  }

  private def canon(m: Raw): String = SpecLoader.canonicalJson(m)

  /** Repeated value maps → (canonical-json → ref name, def name → def body)
    * (make_toml.py:85-116). Maps are counted structurally; count-descending
    * with first-appearance tie-break; only the first boolean map gets a
    * ref (`Y/N/NK`). */
  def refsDefs(choices: List[Raw], numRefs: Int): (Map[String, String], Raw) = {
    val order = choices.map(canon).zipWithIndex.groupBy(_._1)
      .map { case (k, xs) => (k, xs.length, xs.map(_._2).min) }.toList
      .sortBy { case (_, cnt, first) => (-cnt, first) }
    val byCanon = choices.map(m => canon(m) -> m).toMap
    val top = order.filter(_._2 > 1).take(numRefs).map(_._1)
    var references = Map.empty[String, String]
    var definitions = Map.empty[String, Any]
    var booleanFound = false
    top.foreach { key =>
      val mapping = byCanon(key)
      val isBool = mapping.values.exists(_ == true)
      if (!(booleanFound && isBool)) {
        if (isBool) {
          references += key -> "Y/N/NK"
          definitions += "Y/N/NK" -> Map(
            "caseInsensitive" -> true, "values" -> mapping)
          booleanFound = true
        } else {
          val name = mapping.values.map(String.valueOf).mkString("/")
          references += key -> name
          definitions += name -> Map("values" -> mapping, "caseInsensitive" -> true)
        }
      }
    }
    (references, definitions)
  }

  /** Wide-table body + shared defs from mapping rows
    * (make_toml.py:118-160). With `combineDuplicates = false` (default)
    * this matches the reference exactly, INCLUDING its
    * NotImplementedError on duplicate target_field rows
    * (make_toml.py:146). `combineDuplicates = true` goes beyond the
    * reference: multi-source mappings emit a
    * `combinedType = "firstNonNull"` block whose fields keep mapping-row
    * order (first row wins), each with its OWN value map — directly
    * executable by the engine's C2 row-combine. */
  def wideTable(rows: List[MappingRow], schema: Raw,
      numRefs: Int = 3, combineDuplicates: Boolean = false): (Raw, Raw) = {
    val fieldTypes: Map[String, List[String]] = schema
      .getOrElse("properties", Map.empty[String, Any]).asInstanceOf[Raw]
      .map { case (f, p) =>
        f -> (p.asInstanceOf[Raw].getOrElse("type", List("string", "null")) match {
          case l: List[_] => l.map(_.toString)
          case s => List(s.toString)
        })
      }
    val parsedChoices: Map[String, Raw] = rows.flatMap { r =>
      r.valueMapping.map(v => r.targetField -> parseMappedValues(v))
    }.toMap
    val (references, definitions) =
      refsDefs(rows.flatMap(r => r.valueMapping.map(parseMappedValues)), numRefs)

    // the reference's make_toml_table groups by target_field and raises on
    // any multi-row group (make_toml.py:146) instead of last-winning
    if (!combineDuplicates)
      rows.groupBy(_.targetField).foreach { case (_, g) =>
        if (g.size > 1) throw new NotImplementedError("CombinedType not supported")
      }
    def ruleFor(r: MappingRow, src: String): Raw = {
      var rule: Raw = Map("field" -> src) ++
        r.sourceDescription.map("description" -> _).toMap
      // combined mode: each source row keeps its OWN value map (the
      // per-target map would silently apply the last row's mapping to
      // every source); single mode keeps the reference's lookup
      val choices =
        if (combineDuplicates) r.valueMapping.map(parseMappedValues)
        else parsedChoices.get(r.targetField)
      choices.filter(_.nonEmpty).foreach { ch =>
        references.get(canon(ch)) match {
          case Some(ref) => rule += ("ref" -> ref)
          case None =>
            rule += ("values" -> ch)
            rule += ("caseInsensitive" -> true)
        }
        if (fieldTypes.getOrElse(r.targetField, Nil).contains("array"))
          rule += ("type" -> "enum_list")
      }
      rule
    }
    var out = Map.empty[String, Any]
    rows.foreach { r =>
      r.sourceField.filter(_.nonEmpty).foreach { src =>
        val rule = ruleFor(r, src)
        out.get(r.targetField) match {
          case Some(prev) if combineDuplicates =>
            val prevFields = prev match {
              case m: Raw @unchecked if m.contains("combinedType") =>
                m("fields").asInstanceOf[List[Raw]]
              case m: Raw @unchecked => List(m)
              case _ => Nil
            }
            out += (r.targetField -> Map(
              "combinedType" -> "firstNonNull",
              "fields" -> (prevFields :+ rule)))
          case _ => out += (r.targetField -> rule)
        }
      }
    }
    schema.getOrElse("required", Nil).asInstanceOf[List[_]].map(_.toString)
      .foreach { f =>
        if (!out.contains(f)) {
          System.err.println(
            s"Warning: Missing required field $f in schema. Adding empty field...")
          out += (f -> "")
        }
      }
    (out, definitions)
  }

  /** Long-table (oneToMany) generation config, mirroring the reference's
    * long_tables config section (mixin.py): `commonFields` name the shared
    * output attributes, `variableCol` the discriminator attribute, and
    * `valueCols` the per-entry value attributes. Schema fields outside
    * those sets ("other fields") default to constants, as does the
    * variable column; `constantOverrides` flips individual fields. */
  final case class LongTableConfig(
      commonFields: List[String],
      variableCol: String,
      valueCols: List[String],
      constantOverrides: Map[String, Boolean] = Map.empty)

  /** oneToMany entries from generic mapping rows
    * (make_toml.py:162-230). */
  def longTable(rows: List[Map[String, String]], schema: Raw,
      cfg: LongTableConfig): List[Raw] = {
    val schemaFields = schema.getOrElse("properties", Map.empty[String, Any])
      .asInstanceOf[Raw].keys.toList
    val otherFields = schemaFields.filterNot(f =>
      cfg.commonFields.contains(f) || f == cfg.variableCol ||
        cfg.valueCols.contains(f))
    val constantField: Map[String, Boolean] =
      (schemaFields.map(_ -> false).toMap +
        (cfg.variableCol -> true) ++ otherFields.map(_ -> true).toMap) ++
        cfg.constantOverrides
    def bad(r: Map[String, String], c: String): Boolean =
      !r.contains(c) || r(c) == null || r(c).isEmpty
    if (rows.exists(bad(_, cfg.variableCol)))
      throw new IllegalArgumentException(
        s"Mapping dataframe must not contain NaN values in '${cfg.variableCol}' column.")
    if (rows.exists(bad(_, "value_col")))
      throw new IllegalArgumentException(
        "Mapping dataframe must not contain NaN values in the 'value_col' column.")
    val choicesBySource: Map[String, Raw] = rows.flatMap { r =>
      r.get("value_mapping").filter(v => v != null && v.nonEmpty)
        .map(v => r("source_field") -> parseMappedValues(v))
    }.toMap

    def addField(field: String, text: String): Any =
      if (constantField.getOrElse(field, false)) text else Map("field" -> text)

    rows.map { r =>
      val valueCol = r("value_col")
      var valueRule: Any = addField(valueCol, r("source_field"))
      choicesBySource.get(r("source_field")).filter(_.nonEmpty).foreach { ch =>
        valueRule = valueRule.asInstanceOf[Raw] ++
          Map("values" -> ch, "caseInsensitive" -> true)
      }
      var out: Raw = Map(
        cfg.variableCol -> r(cfg.variableCol),
        valueCol -> valueRule) ++
        cfg.commonFields.map(f => f -> addField(f, r(f))).toMap
      otherFields.foreach { f =>
        r.get(f).filter(v => v != null && v.nonEmpty).foreach { v =>
          out += (f -> addField(f, v))
        }
      }
      out
    }
  }

  /** Load generic long-table mapping rows (column name → value) from any
    * read_data format (CSV/XLSX/parquet). */
  def genericRowsFromCsv(spark: org.apache.spark.sql.SparkSession,
      path: String): List[Map[String, String]] = {
    val df = graft.sources.DataReader.readData(spark, path)
    df.collect().toList.map { r =>
      df.columns.flatMap(c => Option(r.getAs[String](c)).map(c -> _)).toMap
    }
  }

  /** Load mapping rows from the intermediate table's standard columns;
    * accepts any read_data format (CSV/XLSX/parquet), like the
    * reference's read_data dispatch (util.py:28-46). */
  def rowsFromCsv(spark: org.apache.spark.sql.SparkSession,
      path: String): List[MappingRow] = {
    graft.sources.DataReader.readData(spark, path).collect().toList.map { r =>
      def opt(c: String): Option[String] =
        if (r.schema.fieldNames.contains(c)) Option(r.getAs[String](c)).filter(_.nonEmpty)
        else None
      MappingRow(r.getAs[String]("target_field"),
        opt("source_description"), opt("source_field"), opt("value_mapping"))
    }
  }
}

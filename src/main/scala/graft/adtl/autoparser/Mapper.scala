package graft.adtl.autoparser

import graft.adtl.Spec.Raw
import graft.adtl.autoparser.DictReader.DictEntry
import scala.collection.immutable.VectorMap

/** The autoparser's LLM-driven generation stages (G2/G4), runnable offline
  * through any [[LlmClient]] — description generation for a data
  * dictionary, and the wide/long intermediate mapping tables that the
  * deterministic spec generator ([[MappingParser]]/[[SpecGenerator]])
  * consumes. Faithful to the reference flows (studied, not copied):
  * dict_writer.py:187-249 (generate_descriptions),
  * mapping/wide_mapper.py:62-157 + mapping/base_mapper.py:60-230
  * (field/value matching, choice relabeling, post-processing),
  * mapping/long_mapper.py:128-233 (long-table matching).
  *
  * All driver-side: these stages operate on a data DICTIONARY (one row per
  * column of the source data, already reduced by the distributed
  * [[DictWriter]] pass), never on data rows.
  */
object Mapper {

  /** One raw dictionary row, case/order preserved exactly as the file had
    * it — description generation must not normalize values (the mapper
    * stage re-loads with [[DictReader]]'s normalization later). */
  final case class RawDictRow(
      sourceField: String,
      sourceDescription: Option[String],
      sourceType: Option[String],
      commonValues: Option[String])

  /** Load a dictionary file for description generation: rename columns via
    * `columnMappings` (standard name → user file's name), keep raw cell
    * text. No completeness validation — descriptions are about to be
    * generated (dict_writer.py _load_dict). */
  def loadRawDict(spark: org.apache.spark.sql.SparkSession, path: String,
      columnMappings: Map[String, String] = Map.empty): List[RawDictRow] = {
    val dd = graft.sources.DataReader.readData(spark, path)
    val renames: Map[String, String] = columnMappings.collect {
      case (std, user) if user != null && user.nonEmpty => user -> std
    }
    val cols = dd.columns.map(c => renames.getOrElse(c.stripPrefix("﻿"),
      renames.getOrElse(c, c.stripPrefix("﻿"))))
    val renamed = dd.toDF(cols.toIndexedSeq: _*)
    def opt(r: org.apache.spark.sql.Row, c: String): Option[String] =
      if (!renamed.columns.contains(c)) None
      else Option(r.getAs[String](c)).filter(_.nonEmpty)
    renamed.collect().toList.map { r =>
      RawDictRow(
        sourceField = opt(r, "source_field").getOrElse(
          throw new IllegalArgumentException(
            "Data dictionary must contain a source_field column")),
        sourceDescription = opt(r, "source_description"),
        sourceType = opt(r, "source_type"),
        commonValues = opt(r, "common_values"))
    }
  }

  /** G2: fill the description column from the LLM's header translations
    * (dict_writer.py:187-249). The response is aligned positionally and
    * each returned name is fuzzy-checked against the original header —
    * the reference's guard against LLM-distorted echoes — then the
    * described dictionary is re-validated (null/duplicate checks, the
    * "Data dictionary validation failed with N errors" shape). */
  def generateDescriptions(dict: List[RawDictRow], llm: LlmClient,
      language: String): List[RawDictRow] = {
    val headers = dict.map(_.sourceField)
    val defs = llm.getDefinitions(headers, language)
    require(defs.length == dict.length && dict.zip(defs).forall {
      case (e, d) => Fuzzy.checkMatches(d.fieldName, List(e.sourceField)).isDefined
    }, "Field names from the LLM don't match the originals.")
    val out = dict.zip(defs).map { case (e, d) =>
      e.copy(sourceDescription = d.translation)
    }
    val errors =
      out.count(_.sourceDescription.isEmpty) +
        dupCount(out.map(_.sourceField)) +
        dupCount(out.flatMap(_.sourceDescription))
    if (errors > 0) throw new IllegalArgumentException(
      s"Data dictionary validation failed with $errors errors")
    out
  }

  private def dupCount(xs: List[String]): Int =
    xs.groupBy(identity).collect { case (_, o) if o.size > 1 => o.size }.sum

  /** Render a (described) dictionary back to CSV text with the user's
    * column names — standard column order, pandas-style minimal quoting. */
  def renderDictCsv(rows: List[RawDictRow],
      columnMappings: Map[String, String] = Map.empty): String = {
    def name(std: String) = columnMappings.getOrElse(std, std)
    def cell(s: String): String =
      if (s.exists(c => c == ',' || c == '"' || c == '\n'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val header = List("source_field", "source_description", "source_type",
      "common_values").map(name).map(cell).mkString(",")
    val body = rows.map(r => List(r.sourceField,
      r.sourceDescription.getOrElse(""), r.sourceType.getOrElse(""),
      r.commonValues.getOrElse("")).map(cell).mkString(","))
    (header :: body).mkString("", "\n", "\n")
  }

  // ---- wide mapping (G4) -------------------------------------------------

  /** One row of the wide intermediate mapping table (indexed by target
    * schema field; wide_mapper.py create_mapping's columns). Value-mapping
    * pair order is the LLM response order. */
  final case class WideRow(
      targetField: String,
      sourceDescription: Option[String],
      sourceField: Option[String],
      commonValues: Option[List[String]],
      targetValues: Option[List[String]],
      valueMapping: Option[List[(String, Option[String])]])

  private def props(schema: Raw): Raw =
    schema.getOrElse("properties", VectorMap.empty[String, Any]).asInstanceOf[Raw]

  private def typesOf(p: Raw, f: String): List[String] =
    p(f).asInstanceOf[Raw].getOrElse("type", List("string", "null")) match {
      case l: List[_] => l.map(String.valueOf)
      case s => List(String.valueOf(s))
    }

  private def enumOf(m: Raw): Option[List[String]] =
    // schema nulls render as "None" — Python's str(None), the form the
    // reference's saved mapping CSVs carry
    m.get("enum").map(_.asInstanceOf[List[_]]
      .map(v => if (v == null) "None" else String.valueOf(v)))

  /** Enum/boolean options for a target field (wide_mapper.py
    * _value_options): booleans offer True/False/None; strings their enum
    * (schema nulls render as "None", the str() form the CSV carries);
    * arrays their item enum. */
  def targetValueOptions(schema: Raw, f: String): Option[List[String]] = {
    val p = props(schema)
    val types = typesOf(p, f)
    if (types.contains("boolean")) Some(List("True", "False", "None"))
    else if (types.contains("string")) enumOf(p(f).asInstanceOf[Raw])
    else if (types.contains("array"))
      p(f).asInstanceOf[Raw].get("items")
        .flatMap(i => enumOf(i.asInstanceOf[Raw]))
    else None
  }

  /** A source entry's value options: normalized common values, or the
    * choices map's VALUES (base_mapper.py common_values). */
  private def sourceValuesOf(e: DictEntry): Option[List[String]] =
    e.commonValues.orElse(e.choices.map(_.values.toList))

  /** G4 step 1 (wide_mapper.py:62-115): match each target schema field to
    * a source dictionary entry via the LLM's description mapping, with
    * fuzzy repair of misspelled descriptions; first mapping per target
    * wins; result reindexed to schema property order. */
  def matchFieldsToSchema(dict: List[DictEntry], schema: Raw,
      llm: LlmClient): List[(String, Option[String], Option[DictEntry])] = {
    val targetFields = props(schema).keys.toList
    val descs = dict.flatMap(_.sourceDescription)
    val byDesc: Map[String, DictEntry] =
      dict.flatMap(e => e.sourceDescription.map(_ -> e))
        .foldLeft(Map.empty[String, DictEntry]) { case (m, (d, e)) =>
          if (m.contains(d)) m else m + (d -> e)
        }
    val resolved = llm.mapFields(descs, targetFields).map { m =>
      m.sourceDescription match {
        case None => (m.targetField, None, None)
        case Some(d) => byDesc.get(d) match {
          case Some(e) => (m.targetField, Some(d), Some(e))
          case None => // LLM echoed a distorted description — fuzzy repair
            val repaired = Fuzzy.checkMatches(d, descs)
            (m.targetField, repaired, repaired.flatMap(byDesc.get))
        }
      }
    }
    val first = resolved.foldLeft(
      VectorMap.empty[String, (String, Option[String], Option[DictEntry])]) {
      case (m, row) => if (m.contains(row._1)) m else m + (row._1 -> row)
    }
    targetFields.map(f => first.getOrElse(f, (f, None, None)))
  }

  /** G4 (wide_mapper.py create_mapping): the full wide mapping table —
    * field matching, value matching for fields with both source common
    * values and target options, choice relabeling when the dictionary
    * carries coded choices, and a warning for unmapped schema fields. */
  def createWideMapping(dict: List[DictEntry], schema: Raw, llm: LlmClient,
      language: String): List[WideRow] = {
    val matched = matchFieldsToSchema(dict, schema, llm)
    val tuples = matched.flatMap { case (f, _, eOpt) =>
      for {
        e <- eOpt
        s <- sourceValuesOf(e)
        t <- targetValueOptions(schema, f)
      } yield (f, s, t)
    }
    val mappedVals: Map[String, List[(String, Option[String])]] =
      llm.mapValues(tuples, language)
        .map(fv => fv.fieldName -> fv.mappedValues).toMap
    val anyChoices = dict.exists(_.choices.isDefined)
    val rows = matched.map { case (f, desc, eOpt) =>
      val vm = mappedVals.get(f).map { pairs =>
        // choice relabeling (base_mapper.py _relabel_choices): coded
        // choices {1: poisson} + LLM {poisson: fish} → {1: fish}
        eOpt.flatMap(_.choices) match {
          case Some(ch) if anyChoices =>
            val byVal = pairs.toMap
            ch.toList.map { case (k, v) => k -> byVal.get(v).flatten }
          case _ => pairs
        }
      }
      WideRow(f, desc, eOpt.map(_.sourceField), eOpt.flatMap(sourceValuesOf),
        targetValueOptions(schema, f), vm)
    }
    val unmapped = rows.filter(_.sourceField.isEmpty).map(_.targetField)
    if (unmapped.nonEmpty) System.err.println(
      "Warning: The following schema fields have not been mapped: " +
        unmapped.mkString("['", "', '", "']"))
    rows
  }

  /** " | "-joined render of lists and "k=v" pairs (base_mapper.py
    * post_process_mapping — the CSV cell format [[MappingParser]] parses
    * back). None renders as "None", Python's str(None). */
  def renderValues(l: List[String]): String = l.mkString(" | ")
  def renderValueMapping(vm: List[(String, Option[String])]): String =
    vm.map { case (k, v) => s"$k=${v.getOrElse("None")}" }.mkString(" | ")

  /** Serialize wide rows to the intermediate mapping CSV (header
    * target_field,source_description,source_field,common_values,
    * target_values,value_mapping). */
  def renderWideCsv(rows: List[WideRow]): String = {
    def cell(s: String): String =
      if (s.exists(c => c == ',' || c == '"' || c == '\n'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val header = "target_field,source_description,source_field," +
      "common_values,target_values,value_mapping"
    val body = rows.map { r =>
      List(r.targetField, r.sourceDescription.getOrElse(""),
        r.sourceField.getOrElse(""),
        r.commonValues.map(renderValues).getOrElse(""),
        r.targetValues.map(renderValues).getOrElse(""),
        r.valueMapping.map(renderValueMapping).getOrElse(""))
        .map(cell).mkString(",")
    }
    (header :: body).mkString("", "\n", "\n")
  }

  /** Wide rows → [[MappingParser.MappingRow]]s, the deterministic spec
    * generator's input — the in-memory equivalent of saving the mapping
    * CSV and re-reading it. */
  def toMappingRows(rows: List[WideRow]): List[MappingParser.MappingRow] =
    rows.map(r => MappingParser.MappingRow(r.targetField, r.sourceDescription,
      r.sourceField, r.valueMapping.map(renderValueMapping)))

  // ---- long mapping (G4, long tables) ------------------------------------

  /** G4 for long tables (long_mapper.py:128-233 + create_mapping): each
    * non-common source field maps to a discriminator value from the
    * variable column's enum plus the value column carrying it; value
    * matching runs per mapped field against its value column's options;
    * `commonFields` are the constant texts filled into every row. Returns
    * generic rows (column → cell text) in [[MappingParser.longTable]]'s
    * input shape, one per source field, unmapped fields included with an
    * empty variable column (the caller filters before spec generation,
    * as the reference's saved mappings do). */
  def createLongMapping(dict: List[DictEntry], schema: Raw,
      cfg: MappingParser.LongTableConfig, commonFields: List[(String, String)],
      llm: LlmClient, language: String): List[VectorMap[String, String]] = {
    val p = props(schema)
    val variableEnum = enumOf(p(cfg.variableCol).asInstanceOf[Raw]).getOrElse(
      throw new IllegalArgumentException(
        s"Variable column '${cfg.variableCol}' in schema does not have an " +
          "enum set. Please set 'enum' in the schema for this field."))
    if (cfg.commonFields != commonFields.map(_._1))
      throw new IllegalArgumentException(
        s"Common columns ${cfg.commonFields} set in the config file do not " +
          s"match provided common fields ${commonFields.map(_._1)}")
    val otherFields = p.keys.toList.filterNot(f =>
      cfg.commonFields.contains(f) || f == cfg.variableCol ||
        cfg.valueCols.contains(f))
    val uncommon = dict.filterNot(e => cfg.commonFields.contains(e.sourceField))
    val entries = llm.mapLongTable(uncommon.flatMap(_.sourceDescription),
      variableEnum, cfg.valueCols, otherFields)
    // pydantic-enum parity: a response outside the schema's options is a
    // validation error, not a silent pass-through
    entries.foreach { en =>
      en.variableName.foreach(v => require(variableEnum.contains(v),
        s"long table mapping: '$v' is not in the ${cfg.variableCol} enum"))
      en.valueCol.foreach(v => require(cfg.valueCols.contains(v),
        s"long table mapping: '$v' is not a value column"))
      en.otherFields.foreach { case (f, v) =>
        require(otherFields.contains(f),
          s"long table mapping: unknown field '$f'")
        enumOf(p(f).asInstanceOf[Raw]).foreach(allowed =>
          require(allowed.contains(v),
            s"long table mapping: '$v' is not in the $f enum"))
      }
    }
    val byDesc = entries.foldLeft(Map.empty[String, Llm.LongEntry]) {
      case (m, e) => if (m.contains(e.sourceDescription)) m
        else m + (e.sourceDescription -> e)
    }
    val merged = uncommon.map(e =>
      e -> e.sourceDescription.flatMap(byDesc.get))
    val unmapped = merged.collect {
      case (e, en) if en.flatMap(_.variableName).isEmpty => e.sourceField
    }
    if (unmapped.nonEmpty) System.err.println(
      "Warning: The following fields have not been mapped to the new " +
        s"schema: ${unmapped.mkString("['", "', '", "']")}")
    val tuples = merged.flatMap { case (e, en) =>
      for {
        s <- sourceValuesOf(e)
        vc <- en.flatMap(_.valueCol)
        t <- targetValueOptions(schema, vc)
      } yield (e.sourceField, s, t)
    }
    val mappedVals: Map[String, List[(String, Option[String])]] =
      llm.mapValues(tuples, language)
        .map(fv => fv.fieldName -> fv.mappedValues).toMap
    merged.map { case (e, en) =>
      var row = VectorMap("source_field" -> e.sourceField) ++
        e.sourceDescription.map("source_description" -> _) ++
        sourceValuesOf(e).map(v => "common_values" -> renderValues(v)) ++
        en.flatMap(_.variableName).map(cfg.variableCol -> _) ++
        en.flatMap(_.valueCol).map("value_col" -> _)
      otherFields.foreach(f =>
        en.flatMap(_.otherFields.get(f)).foreach(v => row += (f -> v)))
      mappedVals.get(e.sourceField).foreach(vm =>
        row += ("value_mapping" -> renderValueMapping(vm)))
      commonFields.foreach { case (f, v) => row += (f -> v) }
      row
    }
  }
}

package graft.adtl.autoparser

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-dictionary normalization (autoparser G3), the deterministic part
  * of the reference's DictReader (/root/reference/src/adtl/autoparser/
  * dict_reader.py; studied, not copied): rename user columns via the
  * configured mappings, keep only the standard dictionary columns, parse
  * choice strings into value maps, lowercase-and-dedupe common values, and
  * validate (source_field present, no duplicates) with the reference's
  * message shape. The pandera/LLM layers are out of engine scope.
  */
object DictReader {

  final case class DictEntry(
      sourceField: String,
      sourceType: Option[String],
      sourceDescription: Option[String],
      commonValues: Option[List[String]],
      choices: Option[Map[String, String]])

  val StandardColumns: List[String] =
    List("source_field", "source_type", "source_description", "common_values", "choices")

  /** Parse one choices cell: entries split by `choiceDelimiter`, each
    * `key<choiceDelimiterMap>value`; a malformed entry voids the cell
    * (dict_reader.py:45-63). */
  def parseChoices(s: String, choiceDelimiter: String,
      choiceDelimiterMap: String): Option[Map[String, String]] = {
    val opts = scala.collection.mutable.LinkedHashMap[String, String]()
    for (part <- s.split(java.util.regex.Pattern.quote(choiceDelimiter), -1)) {
      val kv = part.split(java.util.regex.Pattern.quote(choiceDelimiterMap), 2)
      if (kv.length != 2) return None
      opts(kv(0).trim) = kv(1).trim
    }
    // VectorMap: choices keep file order (the mapper's choice relabeling
    // emits them back in this order)
    if (opts.isEmpty) None
    else Some(scala.collection.immutable.VectorMap.from(opts))
  }

  /** Normalize + validate a user dictionary loaded from a CSV/XLSX/parquet
    * file, via the reference's read_data dispatch (util.py:28-46). */
  def validateDictionaryFile(
      spark: SparkSession, path: String,
      columnMappings: Map[String, String] = Map.empty,
      choiceDelimiter: String = ",",
      choiceDelimiterMap: String = "="): List[DictEntry] =
    validateDictionary(spark, graft.sources.DataReader.readData(spark, path),
      columnMappings, choiceDelimiter, choiceDelimiterMap)

  /** Normalize + validate a user dictionary frame.
    *
    * `columnMappings`: standard name → the user file's column name (the
    * reference config's column_mappings section). Throws with the
    * reference's "Data dictionary validation failed with N errors" shape
    * on missing source_field values or duplicated fields (each offending
    * row counts, like pandera failure cases). */
  def validateDictionary(
      spark: SparkSession, dd: DataFrame,
      columnMappings: Map[String, String] = Map.empty,
      choiceDelimiter: String = ",",
      choiceDelimiterMap: String = "="): List[DictEntry] = {
    val renames: Map[String, String] = columnMappings.collect {
      case (std, user) if user != null && user.nonEmpty => user -> std
    }
    // strip a UTF-8 BOM if the CSV carried one
    val cols = dd.columns.map(c => renames.getOrElse(c.stripPrefix("﻿"),
      renames.getOrElse(c, c.stripPrefix("﻿"))))
    val renamed = dd.toDF(cols.toIndexedSeq: _*)
    val kept = renamed.columns.filter(StandardColumns.contains)
    require(kept.contains("source_field"),
      "Data dictionary must contain a source_field column")
    val rows = renamed.select(kept.map(org.apache.spark.sql.functions.col)
      .toIndexedSeq: _*).collect().toList
    def get(r: org.apache.spark.sql.Row, c: String): Option[String] =
      if (!kept.contains(c)) None
      else Option(r.getAs[String](c)).map(_.trim).filter(_.nonEmpty)

    // pandera parity (data_dict_schema.py DataDictionaryEntry):
    // source_field / source_description / source_type are all REQUIRED
    // non-nullable columns (a missing column is one failure case, each
    // null cell another); source_field and source_description are UNIQUE
    // (every offending row is a failure case); the one_value_column
    // dataframe check requires EXACTLY one of common_values/choices.
    def dupRows(c: String): Int =
      rows.map(get(_, c)).flatten.groupBy(identity).collect {
        case (_, occ) if occ.size > 1 => occ.size
      }.sum
    def requiredErrors(c: String): Int =
      if (!kept.contains(c)) 1 else rows.map(get(_, c)).count(_.isEmpty)
    val nullErrors = requiredErrors("source_field") +
      requiredErrors("source_description") + requiredErrors("source_type")
    val valueColsPresent =
      List("common_values", "choices").count(kept.contains)
    val exclusiveError = if (valueColsPresent != 1) 1 else 0
    val errors = nullErrors + dupRows("source_field") +
      dupRows("source_description") + exclusiveError
    if (errors > 0)
      throw new IllegalArgumentException(
        s"Data dictionary validation failed with $errors errors")

    rows.map { r =>
      DictEntry(
        sourceField = get(r, "source_field").get,
        sourceType = get(r, "source_type"),
        sourceDescription = get(r, "source_description"),
        commonValues = get(r, "common_values").map(
          _.split(java.util.regex.Pattern.quote(choiceDelimiter))
            .map(_.toLowerCase.trim).filter(_.nonEmpty).distinct.toList),
        choices = get(r, "choices")
          .flatMap(parseChoices(_, choiceDelimiter, choiceDelimiterMap)))
    }
  }
}

package graft.adtl.autoparser

import graft.adtl.{SpecLoader, TomlParser}
import graft.adtl.Spec.Raw

/** The reference's autoparser config file (G6), minus the LLM-provider
  * wiring which SURVEY §2.9 scopes out of the engine
  * (/root/reference/src/adtl/autoparser/config/config.py:17-182 and
  * config/autoparser.toml; studied, not copied): `llm_provider`/`llm_model`
  * are parsed and carried as opaque strings — no LLM client exists here.
  *
  * Field and error parity with the pydantic models:
  *  - `language` and `schemas` are required;
  *  - `column_mappings` defaults to the reference's standard headers
  *    (Field Name / Field Type / Description / Common Values); an explicit
  *    block must name source_field/source_type/source_description and
  *    exactly one of common_values/choices;
  *  - every `long_tables` entry must also appear in `schemas`, needs
  *    variable_col + value_cols, and takes at most one of common_cols /
  *    common_fields (common_cols derives from common_fields' keys,
  *    mixin.py:30-41).
  */
final case class AutoparserConfig(
    name: String,
    description: String,
    language: String,
    schemas: Map[String, String],
    columnMappings: Map[String, String],
    choiceDelimiter: String,
    choiceDelimiterMap: String,
    numRefs: Int,
    maxCommonCount: Int,
    minCommonFrequency: Option[Double],
    longTables: Map[String, MappingParser.LongTableConfig],
    /** per long table, the constant values of common_fields (field → value) */
    longTableCommonValues: Map[String, Map[String, String]],
    llmProvider: Option[String],
    llmModel: Option[String],
    /** beyond-reference switch: duplicate target_field mapping rows emit a
      * `combinedType = "firstNonNull"` block (mapping-row order = priority,
      * each source keeping its OWN value map) instead of the reference's
      * NotImplementedError (make_toml.py:146). Default false = exact
      * reference parity. */
    combineDuplicates: Boolean = false) {

  /** Dictionary entries from a user file under this config's column
    * mappings and choice delimiters (DictReader G3). */
  def dictionary(spark: org.apache.spark.sql.SparkSession,
      path: String): List[DictReader.DictEntry] =
    DictReader.validateDictionaryFile(spark, path, columnMappings,
      choiceDelimiter, choiceDelimiterMap)
}

object AutoparserConfig {

  /** DefaultColumnMappingConfig (config.py:43-52). */
  val DefaultColumnMappings: Map[String, String] = Map(
    "source_field" -> "Field Name",
    "source_type" -> "Field Type",
    "source_description" -> "Description",
    "common_values" -> "Common Values")

  /** Load a .toml or .json config file (setup_config, config.py:160-175). */
  def load(path: String): AutoparserConfig = {
    val suffix = path.lastIndexOf('.') match {
      case -1 => ""
      case i => path.substring(i)
    }
    val raw: Raw = suffix match {
      case ".json" => SpecLoader.parseJson(SpecLoader.readUtf8(path))
      case ".toml" => TomlParser.parse(SpecLoader.readUtf8(path))
      case other => throw new IllegalArgumentException(
        s"Unsupported config file format: $other")
    }
    fromRaw(raw)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  def fromRaw(data: Raw): AutoparserConfig = {
    def str(k: String): Option[String] = data.get(k).map(_.toString)
    val schemas: Map[String, String] = data.get("schemas") match {
      case Some(m: Raw @unchecked) => m.map { case (k, v) => k -> v.toString }
      case Some(_) | None => fail("schemas\n  Field required")
    }
    val columnMappings: Map[String, String] = data.get("column_mappings") match {
      case None => DefaultColumnMappings
      case Some(m: Raw @unchecked) =>
        List("source_field", "source_type", "source_description").foreach { k =>
          if (!m.contains(k)) fail(s"column_mappings.$k\n  Field required")
        }
        // a key explicitly set to null counts as unset (pydantic Optional)
        val commonValues = m.get("common_values").filter(_ != null)
        val choices = m.get("choices").filter(_ != null)
        if (commonValues.isDefined && choices.isDefined)
          fail("Only one from 'common values' and 'choices' can be set at once")
        if (commonValues.isEmpty && choices.isEmpty)
          fail("Either 'common values' or 'choices' must be set in column mappings")
        m.map { case (k, v) => k -> v.toString }
      case Some(_) => fail("column_mappings must be a table")
    }
    var longTables = Map.empty[String, MappingParser.LongTableConfig]
    var longValues = Map.empty[String, Map[String, String]]
    data.get("long_tables").foreach {
      case lt: Raw @unchecked => lt.foreach { case (tname, v) =>
        if (!schemas.contains(tname))
          fail(s"Table '$tname' in 'long_tables' not found in 'schemas'")
        val m = v match {
          case r: Raw @unchecked => r
          case _ => fail(s"long_tables.$tname must be a table")
        }
        val variableCol = m.get("variable_col").map(_.toString).getOrElse(
          fail(s"long_tables.$tname.variable_col\n  Field required"))
        val valueCols = m.get("value_cols") match {
          case Some(l: List[_]) => l.map(_.toString)
          case _ => fail(s"long_tables.$tname.value_cols\n  Field required")
        }
        val commonCols = m.get("common_cols") match {
          case Some(l: List[_]) => l.map(_.toString)
          case _ => Nil
        }
        val commonFields = m.get("common_fields") match {
          case Some(cf: Raw @unchecked) => cf.map { case (k, cv) => k -> cv.toString }
          case _ => Map.empty[String, String]
        }
        if (commonCols.nonEmpty && commonFields.nonEmpty)
          fail("Only one from 'common_cols' and 'common_fields' can be set at once")
        longTables += tname -> MappingParser.LongTableConfig(
          commonFields =
            if (commonFields.nonEmpty) commonFields.keys.toList else commonCols,
          variableCol = variableCol,
          valueCols = valueCols)
        longValues += tname -> commonFields
      }
      case _ => fail("long_tables must be a table")
    }
    AutoparserConfig(
      name = str("name").getOrElse("autoparser"),
      description = str("description").getOrElse("Configuration for ADTL autoparser"),
      language = str("language").getOrElse(fail("language\n  Field required")),
      schemas = schemas,
      columnMappings = columnMappings,
      choiceDelimiter = str("choice_delimiter").getOrElse(","),
      choiceDelimiterMap = str("choice_delimiter_map").getOrElse("="),
      numRefs = str("num_refs").map(_.toInt).getOrElse(3),
      maxCommonCount = str("max_common_count").map(_.toInt).getOrElse(25),
      minCommonFrequency = str("min_common_frequency").map(_.toDouble),
      longTables = longTables,
      longTableCommonValues = longValues,
      llmProvider = str("llm_provider"),
      llmModel = str("llm_model"),
      combineDuplicates = data.get("combine_duplicates") match {
        case Some(b: Boolean) => b
        case Some(other) => other.toString.toBoolean
        case None => false
      })
  }
}

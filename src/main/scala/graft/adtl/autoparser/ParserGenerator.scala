package graft.adtl.autoparser

import org.apache.spark.sql.SparkSession

import graft.adtl.{SpecLoader, Spec}
import Spec.Raw

/** Full-parser assembly from intermediate mapping files — the deterministic
  * equivalent of the reference's ParserGenerator
  * (/root/reference/src/adtl/autoparser/make_toml.py:233-379; studied, not
  * copied): one table per config schema, wide mappings (a `target_field`
  * column present) become oneToOne tables via MappingParser.wideTable,
  * long mappings become oneToMany tables via MappingParser.longTable, refs
  * hoist into `adtl.defs`, and the header carries returnUnmatched with
  * per-table schema paths. */
object ParserGenerator {

  /** Build the complete raw spec tree. `mappings`: table → mapping-file
    * path; a single-schema config may pass one path under any key
    * (make_toml.py:279-291's singular-form shortcut). */
  def makeParser(spark: SparkSession, cfg: AutoparserConfig,
      mappings: Map[String, String], parserName: String,
      description: Option[String] = None,
      schemaDir: Option[String] = None): Raw = {
    val tables = cfg.schemas.keys.toList
    val mappingFor: Map[String, String] =
      if (tables.size == 1 && mappings.size == 1) Map(tables.head -> mappings.head._2)
      else tables.map { t =>
        t -> mappings.getOrElse(t, throw new IllegalArgumentException(
          s"Mapping for table '$t' not found in provided mappings."))
      }.toMap

    def schemaPath(t: String): String =
      schemaDir.map(d => s"${d.stripSuffix("/")}/${cfg.schemas(t)}")
        .getOrElse(cfg.schemas(t))

    var defs: Raw = Map.empty
    var tableBodies: Raw = Map.empty
    var tableKinds: Map[String, String] = Map.empty
    tables.foreach { t =>
      val schema = SpecLoader.parseJson(SpecLoader.readUtf8(schemaPath(t)))
      val path = mappingFor(t)
      val isWide = graft.sources.DataReader.readData(spark, path)
        .columns.contains("target_field")
      if (isWide) {
        val rows = MappingParser.rowsFromCsv(spark, path)
        val (body, tableDefs) = MappingParser.wideTable(rows, schema,
          cfg.numRefs, cfg.combineDuplicates)
        defs ++= tableDefs
        tableBodies += t -> body
        tableKinds += t -> "oneToOne"
      } else {
        val rows = MappingParser.genericRowsFromCsv(spark, path)
        val ltCfg = cfg.longTables.getOrElse(t, throw new IllegalArgumentException(
          s"Long-table mapping for '$t' needs a [long_tables.$t] config block"))
        tableBodies += t -> MappingParser.longTable(rows, schema, ltCfg)
        tableKinds += t -> "oneToMany"
      }
    }

    val header: Raw = scala.collection.immutable.VectorMap(
      "name" -> parserName,
      "description" -> description.getOrElse(parserName),
      "returnUnmatched" -> true,
      "tables" -> tables.map(t => t -> (scala.collection.immutable.VectorMap(
        "kind" -> tableKinds(t), "schema" -> schemaPath(t)) ++ (
        if (tableKinds(t) == "oneToMany")
          Map("discriminator" -> cfg.longTables(t).variableCol)
        else Map.empty[String, Any]))).toMap,
      "defs" -> defs)
    scala.collection.immutable.VectorMap[String, Any]("adtl" -> header) ++ tableBodies
  }

  /** makeParser + TOML serialization to `<parserName>.toml` (or `output`). */
  def createParser(spark: SparkSession, cfg: AutoparserConfig,
      mappings: Map[String, String], parserName: String,
      description: Option[String] = None,
      schemaDir: Option[String] = None,
      output: Option[String] = None): String = {
    val toml = SpecGenerator.toToml(
      makeParser(spark, cfg, mappings, parserName, description, schemaDir))
    val path = output.getOrElse(s"$parserName.toml")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toml)
    path
  }
}

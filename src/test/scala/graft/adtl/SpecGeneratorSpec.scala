package graft.adtl

import graft.SparkSpec
import graft.adtl.autoparser.SpecGenerator
import graft.adtl.autoparser.SpecGenerator.FieldMapping
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The generated TOML must be a runnable spec: generate → parse TOML →
  * execute on data → recoded output. Shared value maps hoist into defs. */
class SpecGeneratorSpec extends SparkSpec {

  test("generated spec round-trips through the TOML parser and the engine") {
    val yn = Map("1" -> "yes", "0" -> "no")
    val spec = SpecGenerator.generate(
      "gen_demo", "generated", "subject",
      Seq(
        FieldMapping("subject_id", "subjid", sensitive = true),
        FieldMapping("has_fever", "fever", yn),
        FieldMapping("has_cough", "cough", yn),
        FieldMapping("sex_at_birth", "sex", Map("m" -> "male", "f" -> "female"))))
    val toml = SpecGenerator.toToml(spec)
    // the shared Y/N map is hoisted into defs and referenced twice
    assert(toml.contains("defs"))
    assert("ref = \"map_1\"".r.findAllIn(toml).length == 2)

    val parser = AdtlParser.fromTomlString(toml)
    val schema = StructType(Seq("subjid", "fever", "cough", "sex")
      .map(c => StructField(c, StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("S1", "1", "0", "m")), 1), schema)
    val out = parser.parseDataFrame(spark, df)("subject").collect()(0)
    assert(out.getAs[String]("has_fever") == "yes")
    assert(out.getAs[String]("has_cough") == "no")
    assert(out.getAs[String]("sex_at_birth") == "male")
    assert(out.getAs[String]("subject_id").length == 64) // sha-256 hex
  }

  test("dictionary inference feeds generation end to end") {
    import graft.adtl.autoparser.DictWriter
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val dict = DictWriter.createDict(spark, docs)
    val mappings = dict.filter(_.fieldType == "string").map { f =>
      FieldMapping(s"out_${f.name}", f.name)
    }
    val toml = SpecGenerator.toToml(SpecGenerator.generate(
      "docs_gen", "from dict", "doc", mappings))
    val parser = AdtlParser.fromTomlString(toml)
    val out = parser.parseDataFrame(spark,
      docs.selectExpr("CAST(lang AS STRING) AS lang", "CAST(source AS STRING) AS source",
        "CAST(text AS STRING) AS text"))("doc")
    assert(out.count() == docs.count())
  }
}

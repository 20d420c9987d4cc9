package graft.adtl

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** Spec-compiled ETL over a Structured Streaming source: the same oneToMany
  * plan that runs in batch runs on readStream with no code changes. */
class StreamingParseSpec extends SparkSpec {

  test("oneToMany spec runs on a streaming source (memory sink)") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("adtlstream").toString
    // stage a small CSV-shaped parquet source
    import spark.implicits._
    Seq(("2022-03-01", "1", "0"), ("2022-03-02", "0", "1"), ("2022-03-03", "1", "1"))
      .toDF("dt", "headache", "cough")
      .write.mode("overwrite").parquet(s"$tmp/src")
    val schema = spark.read.parquet(s"$tmp/src").schema

    val parser = AdtlParser.fromJsonString(
      """{
        |  "adtl": {"name": "s", "description": "d", "tables": {
        |    "obs": {"kind": "oneToMany", "discriminator": "name", "common": {"dataset": "D1"}}}},
        |  "obs": [
        |    {"if": {"headache": "1"}, "name": "headache", "date": {"field": "dt"}},
        |    {"if": {"cough": "1"}, "name": "cough", "date": {"field": "dt"}}
        |  ]
        |}""".stripMargin)

    val stream = spark.readStream.schema(schema).parquet(s"$tmp/src")
    val tables = parser.parseStream(spark, stream)
    val q = tables("obs").writeStream
      .format("memory").queryName("adtl_stream_obs")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val rows = spark.sql("SELECT name, date FROM adtl_stream_obs ORDER BY date, name")
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(rows == List(
      ("headache", "2022-03-01"), ("cough", "2022-03-02"),
      ("cough", "2022-03-03"), ("headache", "2022-03-03")))
  }

  test("groupBy specs are rejected in streaming mode with a clear error") {
    import spark.implicits._
    val parser = AdtlParser.fromJsonString(
      """{"adtl": {"name": "s", "description": "d", "tables": {
          "t": {"kind": "groupBy", "groupBy": "sid", "aggregation": "lastNotNull"}}},
          "t": {"sid": {"field": "sid"}}}""")
    val tmp = java.nio.file.Files.createTempDirectory("adtlstream2").toString
    Seq(("a")).toDF("sid").write.mode("overwrite").parquet(s"$tmp/src")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/src").schema).parquet(s"$tmp/src")
    val e = intercept[Spec.SpecValidationError](parser.parseStream(spark, stream))
    assert(e.getMessage.contains("not supported in streaming mode"))
  }
}

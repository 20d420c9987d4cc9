package graft.adtl

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The scale-semantics guarantee: results are identical regardless of how
  * the input is partitioned (1 vs many slices), because file-order
  * dependence is carried by the scan-order id, never by physical row order
  * at aggregation time. This is the parallel ≡ serial equivalence the
  * reference tests with joblib (test_parser.py), hardened for a cluster.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val spec =
    """{
      |  "adtl": {"name": "s", "description": "d", "tables": {
      |    "subject": {"kind": "groupBy", "groupBy": "sid", "aggregation": "applyCombinedType"}}},
      |  "subject": {
      |    "sid": {"field": "subjid"},
      |    "last_sex": {"field": "sex", "values": {"1": "male", "2": "female"}},
      |    "earliest": {"combinedType": "min", "fields": [{"field": "vdate"}]},
      |    "visits": {"combinedType": "list", "excludeWhen": "none", "fields": [{"field": "vdate"}]},
      |    "first_code": {"combinedType": "firstNonNull", "fields": [{"field": "code"}]}
      |  }
      |}""".stripMargin

  private def data(nPartitions: Int): DataFrame = {
    val rows = (0 until 200).map { i =>
      val sid = s"S${i % 17}"
      val sex = if (i % 5 == 0) "" else if (i % 2 == 0) "1" else "2"
      val vdate = f"2022-${1 + i % 12}%02d-${1 + i % 28}%02d"
      val code = if (i % 3 == 0) "" else s"C$i"
      Seq(sid, sex, vdate, code)
    }
    val schema = StructType(Seq("subjid", "sex", "vdate", "code")
      .map(c => StructField(c, StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_: _*)), nPartitions), schema)
  }

  test("groupBy results are identical for 1-partition and 8-partition input") {
    val parser = AdtlParser.fromJsonString(spec)
    def run(p: Int): Array[String] =
      parser.parseDataFrame(spark, data(p))("subject")
        .orderBy("sid").collect().map(_.toString)
    val serial = run(1)
    val parallel = run(8)
    assert(serial.length == 17)
    assert(serial.toList == parallel.toList)
  }

  test("oneToMany output multiset is partition-invariant") {
    val spec2 =
      """{
        |  "adtl": {"name": "s", "description": "d", "tables": {"o": {"kind": "oneToMany", "discriminator": "name"}}},
        |  "o": [{"if": {"sex": "1"}, "name": "male_visit", "date": {"field": "vdate"}},
        |        {"if": {"code": {"=~": "C1"}}, "name": "c1x", "v": {"field": "code"}}]
        |}""".stripMargin
    val parser = AdtlParser.fromJsonString(spec2)
    def run(p: Int): List[String] =
      parser.parseDataFrame(spark, data(p))("o")
        .collect().map(_.toString).sorted.toList
    assert(run(1) == run(8))
  }
}

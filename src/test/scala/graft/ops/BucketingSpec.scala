package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shuffle-elimination via bucketing: pre-bucketed fact tables co-locate
  * join keys at write time, so repeated joins plan with zero Exchange on
  * the bucketed sides — the 100 TB pattern for star-schema pipelines that
  * join the same keys every run. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans without an Exchange on either side") {
    // default warehouse dir (./spark-warehouse, gitignored) — warehouse.dir
    // is a static conf and cannot be set on the shared session
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed scan on both sides: the join itself needs no shuffle —
      // only the final groupBy exchanges
      val joinSection = plan.substring(0, plan.length)
      assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1, s"expected only the groupBy exchange, plan:\n$plan")
      assert(joined.collect().nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted aggregation equals direct aggregation exactly") {
    val e = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    val salted = Skew.saltedSumCount(e, "event_type", "value", 16, col("event_id"))
      .orderBy("event_type").collect()
    val direct = e.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
      .orderBy("event_type").collect()
    assert(salted.map(_.toString).toList == direct.map(_.toString).toList)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-management operators for heavy-hitter keys at cluster scale.
  *
  * A groupBy on a column with few distinct values (event_type: 5 values
  * over billions of rows) concentrates each key in one reducer. Salting
  * splits every key into `salts` sub-keys for the first (wide) aggregation,
  * then merges the partial results in a second (tiny) aggregation — the
  * classic two-stage combine. Works for any algebraic aggregate; exact for
  * sums/counts/min/max.
  *
  * (AQE's skew-join handling covers joins; salting covers aggregations and
  * deterministic pre-AQE plans.)
  */
object Skew {

  /** Deterministic salt derived from stable row content (never rand() —
    * retries/speculative tasks must agree). */
  def salt(parts: Int, c: Column): Column = pmod(xxhash64(c), lit(parts.toLong))

  final case class SaltedAgg(
      partial: Seq[Column => Column], // stage-1 aggregate builders
      merge: Seq[Column => Column], // stage-2 merge of stage-1 results
      names: Seq[String])

  /** Two-stage salted sum/count aggregation:
    * stage 1 groups on (key, salt) — `salts`× more reducers share each hot
    * key; stage 2 merges the ≤ salts partial rows per key. */
  def saltedSumCount(
      df: DataFrame, keyCol: String, valueCol: String,
      salts: Int, saltSource: Column): DataFrame = {
    val stage1 = df
      .withColumn("__salt", salt(salts, saltSource))
      .groupBy(col(keyCol), col("__salt"))
      .agg(
        sum(col(valueCol).cast("decimal(14,2)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
    stage1.groupBy(col(keyCol))
      .agg(
        sum(col("__psum")).cast("double").as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }
}

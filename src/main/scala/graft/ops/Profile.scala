package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling data card — the ingestion audit every new feed gets
  * before any pipeline consumes it (SURVEY.md §2.11 L103): one row per
  * column with row/null/distinct counts and string-rendered min/max.
  * Schema drift, silent null floods, and key-cardinality collapses all
  * surface here first.
  *
  * Scale shape: ONE aggregation job computes every metric (Spark plans
  * the multiple exact count-distincts via Expand — data replicated
  * #distinct-columns× through a single shuffle, the standard one-pass
  * profile); the per-column pivot happens on the single result row via
  * an in-plan explode, no second scan. The input is round-robin
  * REBALANCED first: Expand amplifies every row ~#columns×, so an
  * uneven file layout (one fat parquet split) turns into an
  * #columns×-amplified straggler in the partial aggregation — round 12
  * measured a 36 s max task at median 1.2 s on a 10× replicated
  * layout; the rebalance (one extra narrow shuffle on a one-shot audit
  * job) bounds every partial-agg task at volume/partitions. Exact
  * distincts are the audit contract at profile time; a recurring
  * 100 TB profile would swap count_distinct for the mergeable HLL
  * sketch (L48) column by column.
  */
object Profile {

  /** One row per column: (column, dtype, n_rows, n_nonnull, n_distinct,
    * min_s, max_s). min/max render through CAST(… AS STRING) so every
    * type lands in one comparable output schema; float/double render via
    * DECIMAL(28,6) first — Java's shortest-roundtrip double formatting
    * (1.0E7) and other engines' (%g / 1e+07) disagree above 10^7, while
    * a fixed-scale decimal renders identically everywhere. */
  def profileTable(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val cols = df.columns.toSeq
    def render(c: String) = df.schema(c).dataType match {
      case DoubleType | FloatType =>
        (x: org.apache.spark.sql.Column) => x.cast("decimal(28,6)").cast("string")
      case _ => (x: org.apache.spark.sql.Column) => x.cast("string")
    }
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        render(c)(min(col(c))).as(s"__mn_$c"),
        render(c)(max(col(c))).as(s"__mx_$c"))
    } :+ count(lit(1)).as("__n")
    val parts = try {
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    } catch {
      case _: Throwable => df.sparkSession.sparkContext.defaultParallelism
    }
    val one = df.repartition(parts).agg(aggs.head, aggs.tail: _*)
    val stacked = one.select(explode(array(cols.map { c =>
      struct(lit(c).as("column"),
        lit(df.schema(c).dataType.simpleString).as("dtype"),
        col("__n").as("n_rows"), col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"), col(s"__mn_$c").as("min_s"),
        col(s"__mx_$c").as("max_s"))
    }: _*)).as("p"))
    stacked.select(col("p.*"))
  }
}

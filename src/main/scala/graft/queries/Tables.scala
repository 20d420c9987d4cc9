package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (see TESTDATA.md).
  * One parquet file per table under the scale-factor directory.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** events.ts normalizes to session-timezone TimestampType (UTC in every
    * entry point) whatever physical form the generator wrote:
    *  - TIMESTAMP(NANOS) parquet (vanilla Spark rejects it): read nanos as
    *    long, truncate to micros — the same truncation DuckDB applies on
    *    load, so oracle-comparable. Integer `div` (not `/`) — ns-since-epoch
    *    exceeds double's 2^53 mantissa;
    *  - TIMESTAMP(MICROS) isAdjustedToUTC=false (pandas tz-naive → Spark
    *    TIMESTAMP_NTZ): cast to TimestampType — identity on the underlying
    *    micros under the UTC session zone, and DuckDB reads the same file as
    *    a naive timestamp, so oracle-comparable;
    *  - already TimestampType: pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

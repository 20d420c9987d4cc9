package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal joins Spark has no native operator for, composed from
  * operators Catalyst CAN plan well — the brief's "compose existing ops
  * if semantics allow" route, chosen over a custom SparkPlan because both
  * shapes reduce to one hash shuffle plus codegen'd window/filter work:
  *
  *  - AS-OF: interleave both sides into ONE frame, sort per key by
  *    (time, side, tiebreak) and carry the last state forward with an
  *    ignoreNulls window `last` — every left row picks up the greatest
  *    right time <= its own. One shuffle on the key, never a per-row
  *    range probe or a broadcast nested loop.
  *  - RANGE: quantize interval ends and probe times onto fixed-width
  *    buckets, equi-join on (key, bucket) — each interval lands in
  *    ceil(len/width)+1 buckets — then exact-filter the band. The
  *    inequality predicate never reaches the join operator, so Catalyst
  *    plans a hash join, not BroadcastNestedLoop.
  */
object TemporalJoin {

  private def nullOf(schema: StructType): Column =
    lit(null).cast(schema)

  /** As-of join: for each left row, the right row with the greatest
    * `rightTime` <= `leftTime` for the same `key` (DuckDB/pandas
    * `ASOF LEFT JOIN` semantics; unmatched left rows keep nulls). Right
    * columns surface as `asof_<name>` (from `rightCols`, which must
    * include `rightTime` if wanted). Among right rows tied on time, the
    * greatest `rightTieBreak` wins — pass a unique column to make the
    * pick deterministic when (key, time) can repeat. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String],
      rightTieBreak: Option[String] = None): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(rightCols.map(col): _*)
    val lSchema = left.select(lStruct).schema.head.dataType.asInstanceOf[StructType]
    val rSchema = right.select(rStruct).schema.head.dataType.asInstanceOf[StructType]
    val tie = rightTieBreak.map(col(_).cast("long")).getOrElse(lit(0L))
    val l2 = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__is_left"), lit(0L).as("__tie"),
      lStruct.as("__l"), nullOf(rSchema).as("__r"))
    val r2 = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__is_left"), tie.as("__tie"),
      nullOf(lSchema).as("__l"), rStruct.as("__r"))
    // right sorts before left at equal time, so a state row AT the probe
    // time is eligible (<= semantics)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__is_left"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftOut = left.columns.map(c => col(s"__l.$c").as(c))
    val rightOut = rightCols.map(c => col(s"__m.$c").as(s"asof_$c"))
    l2.unionByName(r2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(leftOut ++ rightOut: _*)
  }

  /** Range join: left rows against intervals `[startCol, endCol]`
    * (inclusive) sharing `key`. `bucketSeconds` sets the band width —
    * each interval replicates into its spanned buckets (size intervals
    * to a few buckets; a guard fails fast if an interval spans more than
    * `maxBucketsPerInterval`, the quadratic-blowup analogue of the LSH
    * bucket cap). Returns left columns + interval columns as
    * `range_<name>`. */
  def rangeJoin(left: DataFrame, intervals: DataFrame, key: String,
      leftTime: String, startCol: String, endCol: String,
      intervalCols: Seq[String], bucketSeconds: Long,
      maxBucketsPerInterval: Int = 1000): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    def bucketOf(t: Column): Column =
      floor(unix_micros(t) / (bucketSeconds * 1000000L)).cast("long")
    val nBuckets = bucketOf(col(endCol)) - bucketOf(col(startCol)) + 1
    val guarded = intervals.withColumn("__nb",
      when(nBuckets > maxBucketsPerInterval,
        raise_error(lit(s"rangeJoin: interval spans more than " +
          s"$maxBucketsPerInterval buckets of ${bucketSeconds}s - widen " +
          "bucketSeconds or split the interval")).cast("long"))
        // inverted interval (end < start): nBuckets < 1 would make the
        // band sequence descend — unbounded spurious replication
        .when(nBuckets < 1,
          raise_error(lit("rangeJoin: interval end precedes start - " +
            "fix or drop the inverted interval")).cast("long"))
        .otherwise(nBuckets))
    val iStruct = struct(intervalCols.map(col): _*)
    val probes = left.select(col(key).as("__k"), bucketOf(col(leftTime)).as("__b"),
      struct(left.columns.map(col): _*).as("__l"), col(leftTime).as("__t"))
    val bands = guarded.select(col(key).as("__k"),
      explode(sequence(bucketOf(col(startCol)),
        bucketOf(col(startCol)) + col("__nb") - 1)).as("__b"),
      iStruct.as("__i"), col(startCol).as("__s"), col(endCol).as("__e"))
    val leftOut = left.columns.map(c => col(s"__l.$c").as(c))
    val intervalOut = intervalCols.map(c => col(s"__i.$c").as(s"range_$c"))
    probes.join(bands, Seq("__k", "__b"))
      .filter(col("__t") >= col("__s") && col("__t") <= col("__e"))
      .select(leftOut ++ intervalOut: _*)
  }
}

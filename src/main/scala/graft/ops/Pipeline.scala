package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed corpus-preparation pipeline: the shape a pretraining data run
  * takes — quality gate, then exact dedup among survivors (keep lowest id
  * per canonical fingerprint), with hooks for the near-dup stages.
  *
  * Single scan + one window shuffle on the 16-byte fingerprint; near-dup
  * stages (MinHash/SimHash/embedding) chain on the output as candidate-pair
  * removals.
  */
object Pipeline {

  def cleanCorpus(df: DataFrame, idCol: String, textCol: String,
      minQuality: Double): DataFrame = {
    val quality = TextAnalysis.qualityScore(col(textCol))
    val fp = TextAnalysis.fingerprint(col(textCol))
    val survivors = df
      .withColumn("quality_score", quality)
      .filter(col("quality_score") >= minQuality)
      .withColumn("__fp", fp)
    val keeper = min(col(idCol)).over(Window.partitionBy(col("__fp")))
    survivors
      .withColumn("__keep", keeper === col(idCol))
      .filter(col("__keep"))
      .drop("__fp", "__keep")
  }

  /** Deterministic train/validation/test assignment: bucket = (first 60
    * bits of md5("salt:id")) mod 10000, compared against cumulative
    * per-ten-thousandth weight thresholds. Pure expressions and NEVER
    * rand() — the split of a given id is stable under re-runs, task
    * retries, cluster size, and data order, and any engine with md5 can
    * reproduce it (the md5-affine discipline of the dedup oracles).
    * Weights must sum to 1; every row gets exactly one split name. */
  def splitAssign(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.98, "validation" -> 0.01, "test" -> 0.01),
      salt: String = "graft"): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val bucket = pmod(
      conv(substring(md5(concat(lit(salt), lit(":"),
        col(idCol).cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(10000L))
    val thresholds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * 10000).toInt)
    val assign = splits.zip(thresholds).dropRight(1)
      .foldRight(lit(splits.last._1): org.apache.spark.sql.Column) {
        case (((name, _), t), acc) => when(bucket < t, lit(name)).otherwise(acc)
      }
    df.withColumn("split_bucket", bucket).withColumn("split", assign)
  }

  /** Deterministic stratified sampling — the source-mixing knob of a
    * pretraining data run (sample web at 0.3, books at 1.0, …). Per
    * stratum, a row survives iff its [[splitAssign]]-style md5 bucket
    * falls under rate·10000; strata missing from `rates` get
    * `defaultRate`. Same guarantees as splitAssign: NEVER rand(), stable
    * under re-runs, retries, partitioning, and data order; a pure
    * filter expression — no shuffle, pushes past column pruning into the
    * scan. Rates are exact at 1/10000 granularity (a rate's survivors
    * are a strict superset of any smaller rate's). */
  def sampleByStratum(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rates must be in [0,1], got $r"))
    val bucket = pmod(
      conv(substring(md5(concat(lit(salt), lit(":"),
        col(idCol).cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(10000L))
    val threshold = rates.toSeq.sortBy(_._1)
      .foldRight(lit(math.round(defaultRate * 10000).toInt)
          : org.apache.spark.sql.Column) {
        case ((name, r), acc) =>
          when(col(stratumCol) === name,
            lit(math.round(r * 10000).toInt)).otherwise(acc)
      }
    df.filter(bucket < threshold)
  }
}

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

  /** The full composed corpus-preparation run — the chain a pretraining
    * data pipeline actually executes, as ONE plan:
    *
    *  1. [[cleanCorpus]] — quality gate + exact dedup (keep min id per
    *     canonical fingerprint);
    *  2. near-dup pairs over the CLEANED corpus
    *     ([[Dedup.ngramJaccardPairsBounded]]: exact in-block Jaccard while
    *     blocks fit `maxBlockSize`, auto-tuned LSH banding above it — the
    *     linear-at-scale route);
    *  3. [[Cluster.dropNearDuplicates]] — pairs → connected components →
    *     drop all but each cluster's min-id survivor (broadcast anti-join;
    *     the corpus never shuffles);
    *  4. [[TextAnalysis.decontaminate]] — drop docs sharing >= `minShared`
    *     winnowed fingerprints with the eval set (eval fps broadcast in,
    *     contaminated ids broadcast back);
    *  5. [[splitAssign]] — md5-bucket train/validation/test, never rand();
    *  6. [[sampleByStratum]] — per-source mixing rates, a pure pushed-down
    *     filter. `sampleSalt` MUST differ from the split salt: with the
    *     same salt the sample bucket and the split bucket are the same
    *     number, so e.g. rate 0.5 would silently keep only 'train' rows;
    *  7. [[TextAnalysis.chunkDocuments]] — stride windows carrying
    *     (stratum, split) through, the pre-embedding step.
    *
    * Output: one row per chunk — (id, chunk_id, chunk_text,
    * n_chunk_tokens, stratum, split).
    *
    * Scale shape: the corpus flows through as narrow scans; the only
    * shuffles are the clean-stage fingerprint window, the bounded
    * pair-generation, and the CC fixpoint over the (tiny) pair list —
    * stages 4–7 are broadcasts and pure projections. The cleaned corpus
    * is materialized once ([[Dedup.materializeBase]]) because pair
    * generation, the anti-join, and the downstream chain all consume it;
    * pass `materializePath` for the cluster-durable parquet form. */
  def corpusPrep(docs: DataFrame, idCol: String, textCol: String,
      stratumCol: String, evalSet: DataFrame,
      minQuality: Double = 0.5,
      ngramN: Int = 2, jaccardThreshold: Double = 0.05,
      maxBlockSize: Int = 1000,
      winnowK: Int = 16, winnowW: Int = 16, minShared: Int = 3,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.98, "validation" -> 0.01, "test" -> 0.01),
      sampleRates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0, sampleSalt: String = "mix",
      chunkTokens: Int = 32, strideTokens: Int = 24,
      materializePath: Option[String] = None): DataFrame = {
    val cleaned = Dedup.materializeBase(
      cleanCorpus(docs, idCol, textCol, minQuality),
      materializePath.map(_ + "/cleaned"))
    val pairs = Dedup.ngramJaccardPairsBounded(cleaned, idCol, textCol,
      blockCol = stratumCol, n = ngramN, threshold = jaccardThreshold,
      maxBlockSize = maxBlockSize,
      materializePath = materializePath.map(_ + "/pairs"))
    val deduped = Cluster.dropNearDuplicates(cleaned, idCol,
      pairs, "id_a", "id_b",
      materializePath = materializePath.map(_ + "/cc"))
    val decont = TextAnalysis.decontaminate(deduped, idCol, textCol,
      evalSet, idCol, textCol, k = winnowK, w = winnowW,
      minShared = minShared)
    val sampled = sampleByStratum(splitAssign(decont, idCol, splits),
      idCol, stratumCol, sampleRates, defaultRate, salt = sampleSalt)
    TextAnalysis.chunkDocuments(sampled, idCol, textCol,
      chunkTokens, strideTokens, carryCols = Seq(stratumCol, "split"))
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

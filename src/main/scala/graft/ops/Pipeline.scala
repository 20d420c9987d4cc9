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

  /** Sequence packing — the final pre-training step: concatenate every
    * document's token stream in ascending-`idCol` order and cut the
    * stream every `capacity` tokens, so each training sequence is exactly
    * full (documents straddle sequence boundaries, GPT-style). Output is
    * one row per (document, sequence) PIECE:
    *
    *   (idCol, seq_id, seq_offset, doc_offset, piece_tokens, piece_text)
    *
    * where the piece is the document's tokens [doc_offset, doc_offset +
    * piece_tokens) placed at [seq_offset, …) of sequence seq_id. Zero-token
    * documents emit nothing; `idCol` must be a unique key (it defines the
    * global concatenation order — with duplicates the order is ambiguous).
    *
    * Scale shape: the global running-token-count is the trap here — a
    * bare `sum over (order by id)` window is ONE task holding the whole
    * corpus. Instead this is a distributed prefix-sum:
    *
    *  1. at plan-build time a seeded sample of ids picks `buckets − 1`
    *     range boundaries, baked into the plan as LITERALS — bucket
    *     membership is a pure function of the id, so recomputation,
    *     retries and both plan branches always agree (no reliance on
    *     exchange reuse or on `spark_partition_id`);
    *  2. per-bucket running sums via a window partitioned BY BUCKET — the
    *     one corpus-wide shuffle, `capacity`-independent and parallel
    *     across buckets;
    *  3. bucket token totals (a map-side-combined aggregate over the same
    *     scan) prefix-scan in a single tiny window over `buckets` rows and
    *     broadcast-join back — each row's global end-offset is its bucket
    *     offset plus its in-bucket running sum;
    *  4. each row then derives its straddled sequence range with exact
    *     integer arithmetic (`DIV` — no double rounding at petabyte token
    *     counts) and explodes into pieces: a narrow projection.
    *
    * Every output value is a pure integer function of (token counts,
    * order), so a SQL engine's global-window cumsum reproduces it exactly
    * — the oracle at gate scale IS the one-task form this plan avoids. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      capacity: Int, buckets: Int = 32): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") > 0)
    // plan-build-time boundaries. Numeric ids: approxQuantile (one bounded
    // pass, sketch-sized driver state). Other orderable ids: a seeded
    // sample (boundary QUALITY only affects bucket balance — bucket
    // membership stays a pure function of the id either way).
    val cuts: Array[Any] =
      if (buckets == 1) Array.empty[Any]
      else df.schema(idCol).dataType match {
        case _: org.apache.spark.sql.types.NumericType =>
          base.stat.approxQuantile(idCol,
            (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
            .distinct.sorted.map(v => v: Any)
        case _ =>
          implicit val ord: Ordering[Any] = new Ordering[Any] {
            def compare(a: Any, b: Any): Int =
              a.asInstanceOf[Comparable[Any]].compareTo(b)
          }
          val ids = base.select(col(idCol)).sample(withReplacement = false,
            fraction = 0.02, seed = 42).limit(buckets * 4096)
            .collect().map(_.get(0)).sorted
          if (ids.isEmpty) Array.empty[Any]
          else (1 until buckets).map { i =>
            ids((i.toLong * ids.length / buckets).toInt.min(ids.length - 1))
          }.distinct.toArray
      }
    // bucket = #{cuts <= id}: a literal when-chain, codegen'd,
    // deterministic. foldLeft puts the HIGHEST cut outermost — the first
    // matching `when` must be the largest boundary the id clears.
    val bucket = cuts.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (cut, i)) => when(col(idCol) >= lit(cut), lit(i + 1))
        .otherwise(acc)
    }
    val wRun = Window.partitionBy(col("__b")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withB = base.withColumn("__b", bucket)
    val offsets = withB.groupBy(col("__b"))
      .agg(sum(col("__n").cast("long")).as("__bsum"))
      .withColumn("__off", coalesce(sum(col("__bsum")).over(wOff), lit(0L)))
      .drop("__bsum")
    val cum = withB
      .withColumn("__lce", sum(col("__n").cast("long")).over(wRun))
      .join(broadcast(offsets), "__b")
      .withColumn("__ce", col("__off") + col("__lce"))
      .withColumn("__cs", col("__ce") - col("__n"))
    val c = capacity.toLong
    cum
      .withColumn("seq_id", explode(sequence(
        expr(s"__cs DIV ${c}L"), expr(s"(__ce - 1) DIV ${c}L"))))
      .withColumn("__ps", greatest(col("__cs"), col("seq_id") * c))
      .withColumn("__pe", least(col("__ce"), (col("seq_id") + 1) * c))
      .select(col(idCol), col("seq_id"),
        (col("__ps") - col("seq_id") * c).cast("int").as("seq_offset"),
        (col("__ps") - col("__cs")).cast("int").as("doc_offset"),
        (col("__pe") - col("__ps")).cast("int").as("piece_tokens"),
        array_join(slice(col("__t"),
          (col("__ps") - col("__cs")).cast("int") + 1,
          (col("__pe") - col("__ps")).cast("int")), " ").as("piece_text"))
  }
}

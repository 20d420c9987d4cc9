package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Approximate/exact nearest-neighbor search over embedding columns
  * (Array[Float]). Dot products are sequential left-to-right folds in
  * double precision — deterministic, and reproducible by an oracle engine
  * computing the same fold.
  *
  * Scale design: brute force = corpus × broadcast(queries) with a two-phase
  * top-k (per-partition partial top-k, then merge) so no group ever
  * collects the whole corpus; IVF = coarse-bucket routing cuts the scanned
  * fraction to nprobe/ncells.
  */
object Similarity {

  /** float[] → double[] (element-exact widening). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k neighbors for each query vector.
    * Two-phase: partial top-k per shuffle partition, then global merge —
    * bounded memory per task at any corpus size. Ties broken by id.
    * Vectors ride packed (one binary blob) with norms precomputed per ROW;
    * the per-PAIR dot runs in the codegen kernel bit-identical to the
    * declarative sequential fold (the interpreted zip_with/aggregate pair
    * fold dominated otherwise — same treatment as embeddingNearDupPairs). */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    val cv = toDouble(col(corpusVec))
    val qv = toDouble(col(queryVec))
    val c = corpus.select(col(corpusId).as("n_id"),
      graft.functions.PackedDoubles.packCol(spark, cv).as("n_vp"),
      norm(cv).as("n_nrm"))
    val q = queries.select(col(queryId).as("q_id"),
      graft.functions.PackedDoubles.packCol(spark, qv).as("q_vp"),
      norm(qv).as("q_nrm"))
    var scored = c.crossJoin(broadcast(q))
      .withColumn("sim",
        graft.functions.PackedDoubles.dotCol(spark, col("n_vp"), col("q_vp")) /
          (col("n_nrm") * col("q_nrm")))
      .select(col("q_id"), col("n_id"), col("sim"))
    if (excludeSelf) scored = scored.filter(col("q_id") =!= col("n_id"))
    topKPerGroup(scored, "q_id", "n_id", "sim", k)
  }

  /** IVF-style ANN: vectors are pre-bucketed by a coarse cell (here any
    * discrete column, e.g. a cluster label); queries probe their own cell
    * only (nprobe=1 shape). Recall trades off against the fraction of the
    * corpus scanned — the 100 TB path. */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String, cellCol: String,
      queries: DataFrame, queryId: String, queryVec: String, queryCell: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    val cv = toDouble(col(corpusVec))
    val qv = toDouble(col(queryVec))
    val c = corpus.select(col(cellCol).as("cell"), col(corpusId).as("n_id"),
      graft.functions.PackedDoubles.packCol(spark, cv).as("n_vp"),
      norm(cv).as("n_nrm"))
    val q = queries.select(col(queryCell).as("cell"), col(queryId).as("q_id"),
      graft.functions.PackedDoubles.packCol(spark, qv).as("q_vp"),
      norm(qv).as("q_nrm"))
    var scored = c.join(broadcast(q), Seq("cell"))
      .withColumn("sim",
        graft.functions.PackedDoubles.dotCol(spark, col("n_vp"), col("q_vp")) /
          (col("n_nrm") * col("q_nrm")))
      .select(col("q_id"), col("n_id"), col("sim"))
    if (excludeSelf) scored = scored.filter(col("q_id") =!= col("n_id"))
    topKPerGroup(scored, "q_id", "n_id", "sim", k)
  }

  /** Metadata-FILTERED ANN with pre-filter semantics: the predicate is
    * applied to the corpus BEFORE cell probing and scoring, so every
    * query still gets k survivors drawn from the eligible set — the
    * filtered-vector-search contract. The naive alternative (post-filter
    * an unfiltered top-k) silently returns fewer than k rows as the
    * filter gets selective and is exactly the bug this operator exists
    * to prevent; the wrapper owns that semantic so callers can't
    * mis-order the composition.
    *
    * Scale: the predicate is a plain `Column`, so Catalyst pushes it
    * into the corpus parquet scan (PushedFilters — cheaper than any
    * index when selectivity is modest); the probed-cell join then runs
    * over the filtered slice only. For highly selective predicates the
    * plan degrades gracefully toward a brute-force scan of the eligible
    * sliver, which is the correct regime there. */
  def filteredIvfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String, cellCol: String,
      predicate: org.apache.spark.sql.Column,
      queries: DataFrame, queryId: String, queryVec: String, queryCell: String,
      k: Int, excludeSelf: Boolean = true): DataFrame =
    ivfTopK(corpus.filter(predicate), corpusId, corpusVec, cellCol,
      queries, queryId, queryVec, queryCell, k, excludeSelf)

  /** kNN GRAPH construction (every vector's top-k neighbors — the
    * backbone of kNN-graph clustering, label propagation, HNSW-style
    * index builds): a cell-bucketed SELF-join, so the corpus is both
    * sides — unlike [[ivfTopK]] nothing is broadcast-sized. Per cell the
    * work is quadratic BY DESIGN (that is what a kNN graph costs inside
    * a bucket); the in-plan `maxCellSize` guard fails fast instead of
    * letting one mega-cell quietly own the stage — re-cluster with more
    * cells, the documented contract. One cell equi-shuffle + the O(k)-
    * state top-k aggregation (TopKStructAgg — no per-cell slice ever
    * materializes per task). Neighbors come from the vector's OWN cell
    * (nProbe=1 semantics): recall at cell boundaries is the measured
    * trade [[annRecall]] reports, not a silent loss. */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String,
      cellCol: String, k: Int, maxCellSize: Long = 10000): DataFrame = {
    require(k >= 1, s"knnGraph: k must be >= 1, got $k")
    val spark = corpus.sparkSession
    val v = toDouble(col(vecCol))
    val base = corpus.select(col(cellCol).as("cell"), col(idCol).as("id"),
      graft.functions.PackedDoubles.packCol(spark, v).as("vp"),
      norm(v).as("nrm"))
    val sized = base
      .join(base.groupBy("cell").agg(count(lit(1)).as("__cs")), Seq("cell"))
      .withColumn("cell",
        when(col("__cs") <= maxCellSize, col("cell"))
          .otherwise(raise_error(concat(
            lit(s"knnGraph: cell larger than $maxCellSize (size="),
            col("__cs").cast("string"),
            lit(") — re-cluster with more cells")))))
    val a = sized.select(col("cell"), col("id").as("q_id"),
      col("vp").as("q_vp"), col("nrm").as("q_nrm"))
    val b = base.select(col("cell"), col("id").as("n_id"),
      col("vp").as("n_vp"), col("nrm").as("n_nrm"))
    val scored = a.join(b.hint("SHUFFLE_HASH"), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim",
        graft.functions.PackedDoubles.dotCol(spark, col("q_vp"), col("n_vp")) /
          (col("q_nrm") * col("n_nrm")))
      .select(col("q_id"), col("n_id"), col("sim"))
    topKPerGroup(scored, "q_id", "n_id", "sim", k)
  }

  /** Distributed top-k per group. Deterministic ordering (score desc,
    * id asc), bit-identical to slice(array_sort(collect_list(...)), 1, k).
    *
    * Integral ids (byte/short/int/long — surfaced as long) take the O(k)
    * aggregation-state path: ONE groupBy whose bounded
    * TypedImperativeAggregate (TopKStructAgg) holds at most k entries per
    * group per task and partially merges map-side — one shuffle, and no
    * task ever materializes a group's slice. Any other id type (string
    * doc ids, decimals) keeps its type through the generic
    * collect_list/array_sort path — same ordering and output, O(group)
    * per-task state, so prefer integral ids for very large groups. */
  /** Measured ANN quality: recall@k of an approximate top-k result against
    * the exact top-k over the same query set — the number a production ANN
    * deployment reports before trading nProbe (or bands, or probes) for
    * latency. Both inputs are in the (q_id, n_id, …) shape this module's
    * search operators emit; per query, recall = |approx ∩ exact| / k.
    * Queries present in `exact` but missing from `approx` (e.g. all probed
    * cells empty) score 0 — silent disappearance is the failure mode a
    * recall report exists to catch.
    *
    * Scale shape: both inputs are query-set-sized (≤ k rows per evaluated
    * query — exact ground truth at corpus scale is priced per query, so
    * recall is evaluated over a SAMPLED query set), so this is a join of
    * two skinny frames on (q_id, n_id); the corpus itself is never
    * touched. recall is hits/k with both operands exact small integers —
    * the double division is correctly rounded and engine-exact. */
  def annRecall(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val hits = approx.select(col("q_id"), col("n_id"))
      .join(exact.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"))
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    exact.select("q_id").distinct()
      .join(hits, Seq("q_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("recall", col("hits").cast("double") / lit(k.toDouble))
  }

  /** MATRYOSHKA-style dimension-truncation recall: top-k search on the
    * first `dims` dimensions (the MRL storage/latency trade — half the
    * dims, half the scan bytes) measured against full-dimension exact
    * ground truth over a query set, via [[annRecall]]. The number a
    * deployment reads before committing to truncated vectors. Both sides
    * are the exact brute-force path, so the gate's recall values are
    * exact integer ratios. */
  def matryoshkaRecall(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      dims: Int, k: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    val approx = bruteForceTopK(
      corpus.withColumn("__mv", slice(col(vecCol), 1, dims)), idCol, "__mv",
      queries.withColumn("__mq", slice(col(qVecCol), 1, dims)), qIdCol,
      "__mq", k)
    val exact = bruteForceTopK(corpus, idCol, vecCol,
      queries, qIdCol, qVecCol, k)
    annRecall(approx, exact, k)
  }

  /** Embedding-space outlier detection — the semantic-quality filter a
    * curated corpus runs per source/cluster: each group's CENTROID from
    * exact per-dimension DECIMAL(28,14) sums (order-invariant; one final
    * double division per dimension), then every vector's cosine to its
    * own group's centroid via the house sequential fold, flagged when it
    * falls below `minCos`. Mis-batched documents, garbage embeddings and
    * boilerplate sit far from their group's mass and surface here.
    *
    * Scale shape: ONE narrow explode + (group, dim) aggregation builds
    * the centroids (rows = groups × dims — tiny), reassembled per group
    * by a sorted collect, broadcast back onto the corpus for a zero-
    * shuffle scoring scan. Null/zero-norm guards surface as null cosine
    * rather than NaN. */
  def centroidOutliers(df: DataFrame, idCol: String, vecCol: String,
      groupCol: String, minCos: Double): DataFrame = {
    val v = toDouble(col(vecCol))
    val cells = df.select(col(groupCol).as("grp"),
        posexplode(v).as(Seq("pos", "val")))
      .groupBy("grp", "pos")
      .agg((sum(col("val").cast("decimal(28,14)")).cast("double") /
        count(lit(1)).cast("double")).as("m"))
    val cents = cells.groupBy("grp")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"))
    // 9-dp render: the centroid's decimal→double conversion is not
    // correctly rounded in every engine (measured 1-ulp drift in DuckDB),
    // so the cosine renders at 9 dp and the outlier decision compares the
    // ROUNDED value — the same boundary discipline as the ln-based scores
    df.select(col(idCol).as("id"), col(groupCol).as("grp"), v.as("x"))
      .join(broadcast(cents), Seq("grp"))
      .select(col("id"), col("grp"),
        when(norm(col("x")) * norm(col("c")) > 0,
          round(cosine(col("x"), col("c")), 9)).as("cos_centroid"))
      .withColumn("is_outlier",
        when(col("cos_centroid").isNotNull, col("cos_centroid") < minCos))
  }

  /** EMBEDDING CENTROID DRIFT per group between two snapshots — the
    * representation-drift monitor beside the value-space tests (PSI/KS
    * watch scalar features; this watches the embedding space itself:
    * "did src0's vectors move between last month's index build and
    * today's?"): per (group, snapshot) the exact-mean centroid, then
    * cosine between the two centroids and the L2 of their difference.
    *
    * Exactness ladder ([[centroidOutliers]]' discipline): per-dimension
    * sums in DECIMAL(28,14) (order/partition-invariant), the mean's one
    * division rounds to 9 dp — making every downstream product a pure
    * function of identical doubles in any engine — products re-quantize
    * to DECIMAL(28,14) so the dimension sums are again order-free, and
    * cosine/L2 render at 9 dp. One-sided groups emit null drift columns.
    *
    * Scale shape: one (group, snapshot, dim) cell shuffle whose partial
    * aggregation collapses map-side (cells = groups × 2 × dims, never
    * vector count), one (group, dim) pivot, one group aggregation — no
    * vector ever crosses the wire twice, no joins, no collects. */
  def centroidDrift(df: DataFrame, groupCol: String, vecCol: String,
      snapCol: String, baseLabel: String, currentLabel: String)
      : DataFrame = {
    val v = toDouble(col(vecCol))
    val cells = df
      .filter(col(snapCol).isin(baseLabel, currentLabel))
      .select(col(groupCol).as("grp"), col(snapCol).cast("string").as("snap"),
        posexplode(v).as(Seq("pos", "val")))
      .groupBy("grp", "snap", "pos")
      .agg(round(sum(col("val").cast("decimal(28,14)")).cast("double") /
          count(lit(1)).cast("double"), 9).as("m"),
        count(lit(1)).as("cnt"))
    val piv = cells.groupBy("grp", "pos").agg(
      max(when(col("snap") === baseLabel, col("m"))).as("mb"),
      max(when(col("snap") === currentLabel, col("m"))).as("mc"),
      max(when(col("snap") === baseLabel, col("cnt"))).as("nb"),
      max(when(col("snap") === currentLabel, col("cnt"))).as("nc"))
    def q14(c: Column) = c.cast("decimal(28,14)")
    def d(c: Column) = c.cast("double")
    val agg = piv.groupBy("grp").agg(
      max(col("nb")).as("n_base"), max(col("nc")).as("n_cur"),
      sum(q14(col("mb") * col("mc"))).as("__dot"),
      sum(q14(col("mb") * col("mb"))).as("__b2"),
      sum(q14(col("mc") * col("mc"))).as("__c2"),
      sum(q14((col("mb") - col("mc")) * (col("mb") - col("mc"))))
        .as("__d2"))
    agg.select(col("grp"), col("n_base"), col("n_cur"),
      when(d(col("__b2")) > 0 && d(col("__c2")) > 0,
        round(d(col("__dot")) / (sqrt(d(col("__b2"))) * sqrt(d(col("__c2")))),
          9)).as("centroid_cos"),
      when(col("n_base").isNotNull && col("n_cur").isNotNull,
        round(sqrt(d(col("__d2"))), 9)).as("centroid_l2"))
  }

  /** CENTROID (simplified) SILHOUETTE per label — the cluster-quality
    * report beside [[centroidOutliers]] (which flags points; this
    * scores the PARTITION): per point, a = L2 distance to its OWN
    * label's centroid, b = the minimum distance to any OTHER label's
    * centroid, s = (b − a) / max(a, b); per label the exact mean of s
    * and the member count. The classic silhouette's per-point
    * all-pairs term is O(n²) — the centroid form is the standard
    * linear surrogate (Hruschka et al.), and the one a 100 TB
    * embedding table can actually afford.
    *
    * Exactness ladder ([[centroidDrift]]'s): per-dim centroid means
    * round to 9 dp (identical doubles in any engine), every distance is
    * the SEQUENTIAL left-fold sqrt(Σ(x−m)²) rounded to 9 dp before the
    * min — so a/b/s are pure functions of shared doubles — s rounds to
    * 9 dp and quantizes to DECIMAL(18,9) for the order-free group sum.
    * A corpus with ONE label emits null s (the silhouette is undefined,
    * not 0); a point tied a = b = 0 scores 0.
    *
    * Scale shape: one (label, dim) cell shuffle (map-side collapsed),
    * centroids broadcast once; the point × centroid amplification runs
    * through the broadcast (no shuffle) and the per-point partial
    * aggregation collapses it map-side, so the only row-shuffle is n
    * point rows. Work is n·k·d by definition — the in-plan guard
    * raises past `maxGroups` naming the alternative (sample labels or
    * pre-reduce with IVF cells). */
  def centroidSilhouette(df: DataFrame, idCol: String, vecCol: String,
      groupCol: String, maxGroups: Int = 4096): DataFrame = {
    val v = toDouble(col(vecCol))
    val cells = df.select(col(groupCol).as("grp"),
        posexplode(v).as(Seq("pos", "val")))
      .groupBy("grp", "pos")
      .agg(round(sum(col("val").cast("decimal(28,14)")).cast("double") /
        count(lit(1)).cast("double"), 9).as("m"))
    val cents = cells.groupBy("grp")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"))
      .withColumn("__ng", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("c", when(col("__ng") <= maxGroups, col("c"))
        .otherwise(raise_error(concat(
          lit("centroidSilhouette: "), col("__ng").cast("string"),
          lit(s" labels > maxGroups=$maxGroups — per-point work is" +
            " labels × dims; sample the label set or pre-reduce with IVF" +
            " cells, or raise maxGroups")))))
      .select(col("grp").as("cgrp"), col("c"))
    def l2(x: Column, c: Column): Column =
      sqrt(aggregate(zip_with(x, c, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, t) => acc + t))
    val perPoint = df
      .select(col(idCol).as("id"), col(groupCol).as("grp"), v.as("x"))
      .crossJoin(broadcast(cents))
      .select(col("id"), col("grp"), col("cgrp"),
        round(l2(col("x"), col("c")), 9).as("d"))
      .groupBy("id", "grp")
      .agg(max(when(col("grp") === col("cgrp"), col("d"))).as("a"),
        min(when(col("grp") =!= col("cgrp"), col("d"))).as("b"))
    perPoint
      .withColumn("s",
        when(col("b").isNull, lit(null).cast("double"))
          .when(greatest(col("a"), col("b")) > 0,
            round((col("b") - col("a")) / greatest(col("a"), col("b")), 9))
          .otherwise(lit(0.0)))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("s").cast("decimal(18,9)")).cast("double") /
          count(col("s")).cast("double"), 9).as("mean_silhouette"))
  }

  def topKPerGroup(scored: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val spark = scored.sparkSession
    val integralId = scored.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integralId) {
      val item = struct((lit(-1.0) * col(scoreCol)).as("negScore"),
        col(idCol).cast("long").as("id"))
      scored
        .groupBy(col(groupCol))
        .agg(graft.functions.TopKStructAgg.topK(spark, item, k).as("top"))
        .select(col(groupCol), posexplode(col("top")))
        .select(col(groupCol), (col("pos") + 1).cast("long").as("rank"),
          col("col.id").as(idCol), (lit(-1.0) * col("col.negScore")).as(scoreCol))
    } else {
      val item = struct((lit(-1.0) * col(scoreCol)).as("negScore"),
        col(idCol).as("id"))
      scored
        .groupBy(col(groupCol))
        .agg(slice(array_sort(collect_list(item)), 1, k).as("top"))
        .select(col(groupCol), posexplode(col("top")))
        .select(col(groupCol), (col("pos") + 1).cast("long").as("rank"),
          col("col.id").as(idCol), (lit(-1.0) * col("col.negScore")).as(scoreCol))
    }
  }
}

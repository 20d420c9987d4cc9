package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate clustering: the stage AFTER pair generation in a production
  * dedup pipeline. LSH / SimHash / Jaccard emit PAIRS; dropping duplicates
  * needs CLUSTERS (near-duplication is not transitive at any threshold, so
  * A~B, B~C must merge into one group even when A~C missed the cut) and a
  * canonical survivor per cluster.
  *
  * Connected components by iterative min-label propagation with pointer
  * jumping, all in the DataFrame API so every step is a shuffle Catalyst
  * plans (hash-join on id — AQE-coalesced, skew-split like any join):
  *
  *  1. label(v) ← min(label(v), min over neighbors u of label(u))
  *  2. label(v) ← label(label(v))            (pointer jump)
  *
  * Step 1 alone needs O(diameter) rounds; the jump halves pointer chains
  * each round, so convergence is O(log d) — a 100-hop chain closes in ~7
  * rounds. Labels only ever DECREASE, so `sum(label)` is strictly
  * monotone until the fixpoint: convergence detection is one tiny
  * aggregate per round, no change-flag join. Per-round lineage is cut via
  * [[Dedup.materializeBase]] (localCheckpoint, or parquet under
  * `materializePath` — the cluster-safe form under dynamic allocation).
  *
  * All operators are min/least folds — order- and partition-invariant,
  * deterministic. The known alternative for adversarial graphs (star
  * graphs of stars) is alternating large-star/small-star [Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14]; min-label +
  * jumping matches it on dedup-shaped graphs (small components, short
  * chains) with half the per-round shuffles.
  */
object Cluster {

  /** Connected components over an undirected pair list. Returns one row
    * per distinct node: (id, cluster) with cluster = the minimum id
    * reachable from it. Throws if `maxIters` rounds don't reach the
    * fixpoint (deterministic failure beats silently-unmerged clusters);
    * with pointer jumping 25 rounds cover diameters up to ~2^25. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 25, materializePath: Option[String] = None): DataFrame = {
    // materialize the pair list BEFORE symmetrizing: the union references
    // it twice, and an unmaterialized (possibly quadratic) pair plan would
    // execute once per reference
    val halfRaw = Dedup.materializeBase(
      pairs.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst")).filter(col("src") =!= col("dst")),
      materializePath.map(_ + "/pairs"))
    // bound the fixpoint's per-round map width to the PAIR VOLUME: the
    // checkpoint inherits the pair ENGINE's layout (round-16 audit: a
    // width-pinned engine handed a few-thousand-row pair list 32
    // partitions, and every CC stage then scheduled 64 near-empty tasks
    // under q_entity_resolution — +45% on the gate). The count is a
    // cheap block scan of the just-materialized frame; 20k pairs/task
    // keeps gate graphs on 1–2 tasks while big pair lists keep their
    // width (coalesce only ever lowers it).
    val half = {
      val w = math.max(1L, math.min(halfRaw.count() / 20000L + 1L,
        Pipeline.sessionWidth(pairs.sparkSession).toLong)).toInt
      if (halfRaw.rdd.getNumPartitions > w) halfRaw.coalesce(w) else halfRaw
    }
    // symmetric, deduped, PLUS a self-loop per node: with (v,v) present,
    // "min label over N(v) ∪ {v}" is ONE join + ONE aggregation per round
    // instead of neighbor-min plus a separate merge join. Materialized
    // once, reused every round.
    val sym = half
      .unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
    val edges = Dedup.materializeBase(
      sym.unionByName(sym.select(col("src")).distinct()
        .select(col("src"), col("src").as("dst")))
        .distinct(),
      materializePath.map(_ + "/edges"))

    var labels = edges.groupBy("src").agg(min(col("dst")).as("lbl"))
      .select(col("src").as("id"), col("lbl"))
    var prevSum: java.math.BigDecimal = null
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      // LAZY checkpoint: the convergence aggregate right below is the
      // action that materializes it — one job per round, not two
      labels = materializePath match {
        case Some(p) => Dedup.materializeBase(step(edges, labels),
          Some(p + s"/labels_$it"))
        case None => step(edges, labels).localCheckpoint(false)
      }
      val lblSum = labels
        .agg(org.apache.spark.sql.functions.sum(col("lbl").cast("decimal(38,0)")).as("s"))
        .head.getDecimal(0)
      // null sum ⇔ zero label rows ⇔ empty pair list — already a fixpoint
      // (a clean corpus with no near-dup pairs is a normal outcome)
      converged = lblSum == null ||
        (prevSum != null && lblSum.compareTo(prevSum) == 0)
      prevSum = lblSum
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds - " +
          "raise maxIters (diameter coverage doubles per round)")
    labels.select(col("id"), col("lbl").as("cluster"))
  }

  /** One round: min label over N(v) ∪ {v} (the self-loops make the own
    * label part of the same aggregation), then pointer jump. */
  private def step(edges: DataFrame, labels: DataFrame): DataFrame = {
    val stepped = edges
      .join(labels.select(col("id").as("dst"), col("lbl")), "dst")
      .groupBy("src").agg(min(col("lbl")).as("lbl"))
      .select(col("src").as("id"), col("lbl"))
    // label values are themselves node ids, so the jump join always hits
    stepped
      .join(stepped.select(col("id").as("lbl"), col("lbl").as("jl")), Seq("lbl"))
      .select(col("id"), col("jl").as("lbl"))
  }

  /** The actual near-dedup: keep the minimum-id member of every cluster
    * plus every row that appears in no pair. Cluster ids broadcast back
    * onto the corpus when small; the corpus itself never shuffles. */
  def dropNearDuplicates(df: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 25, materializePath: Option[String] = None): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol, maxIters, materializePath)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as("__drop_id"))
    df.join(losers, col(idCol) === col("__drop_id"), "left_anti")
  }

  /** Multi-signal (hybrid) dedup clustering: a document is a duplicate if
    * it near-dups another TEXTUALLY (n-gram Jaccard pairs) OR
    * SEMANTICALLY (embedding cosine pairs) — the two detectors' edge
    * lists union into one graph and connected components merge chains
    * that CROSS signals (text a~b, semantic b~c ⇒ {a,b,c} one cluster:
    * paraphrases and verbatim copies of the same document collapse
    * together, which neither detector finds alone). Per cluster member:
    * the canonical min-id `cluster`, the cluster size, and how many of
    * its incident edges came from each signal — the audit trail for "why
    * was this dropped".
    *
    * Scale shape: each detector keeps its own banded/bucketed pair plan;
    * the union is pair-lists only (never corpus rows) and the CC engine
    * iterates on that same skinny edge list. */
  def hybridDupClusters(textPairs: DataFrame, semanticPairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      maxIters: Int = 25): DataFrame = {
    val t = textPairs.select(col(aCol).as("id_a"), col(bCol).as("id_b"))
      .distinct().withColumn("sig", lit("text"))
    val s = semanticPairs.select(col(aCol).as("id_a"), col(bCol).as("id_b"))
      .distinct().withColumn("sig", lit("semantic"))
    // materialize the tagged union ONCE: both detectors' pair engines are
    // the expensive subtrees here, and the frame feeds TWO consumers —
    // the CC edge list and the per-id signal audit — which otherwise each
    // re-run the full pair generation (round-16 stage audit: the text
    // pair stages executed twice per q_hybrid_dedup run; guide §2.4)
    val tagged = Dedup.materializeBase(t.unionByName(s), None)
    val edges = tagged.select("id_a", "id_b").distinct()
    val perId = tagged
      .select(explode(array(col("id_a"), col("id_b"))).as("id"), col("sig"))
      .groupBy("id")
      .agg(sum(when(col("sig") === "text", 1L).otherwise(0L)).as("n_text_edges"),
        sum(when(col("sig") === "semantic", 1L).otherwise(0L)).as("n_sem_edges"))
    connectedComponents(edges, "id_a", "id_b", maxIters)
      .withColumn("cluster_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))))
      .join(perId, Seq("id"))
      .select("cluster", "id", "cluster_size", "n_text_edges", "n_sem_edges")
  }
}

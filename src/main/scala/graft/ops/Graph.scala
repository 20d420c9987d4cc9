package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph ranking — the crawl-frontier / source-authority signal a
  * web-scale corpus pipeline feeds into quality weighting (which domains
  * to crawl deeper, how much to trust a source when mixing). Same
  * engineering stance as [[Cluster]]: iterative fixpoint work expressed
  * as DataFrame joins/aggregations so every round is a shuffle Catalyst
  * plans and AQE re-optimizes.
  */
object Graph {

  /** Weighted PageRank with a FIXED iteration count (Page et al. 1999,
    * per-node form: `r(v) = (1-d) + d * sum_{u->v} w_uv * r(u) / W_u`),
    * parallel edges folded into integer weights, dangling nodes simply
    * not contributing (the simplified no-redistribution form — ranks
    * then need no global normalizing pass, so no extra all-reduce per
    * round). Returns (node, rank) for every node in `src ∪ dst`.
    *
    * Determinism: the per-edge contribution `((r * d) * w) / W` is one
    * pinned-parenthesization double expression quantized to
    * DECIMAL(28,14) (Spark's double→decimal cast is HALF_UP — the same
    * rounding DuckDB applies, the house nb/lm discipline), summed
    * exactly (decimal addition is order-invariant), so ranks are
    * bit-identical at any partitioning and SQL-replicable by an
    * iteration-unrolled oracle. Fixed iterations, not convergence
    * detection: rank consumers (crawl schedulers, mixture weights) want
    * a deterministic artifact, and K is small (rank mass spreads one hop
    * per round).
    *
    * Scale shape: per iteration, ONE shuffle join of edges with the rank
    * frame on `src` (both sides hash-partitioned on the same key — AQE
    * coalesces/skew-splits) and ONE aggregation shuffle on `dst`; the
    * out-weight frame is computed once. Rank lineage is cut every round
    * via [[Dedup.materializeBase]] (localCheckpoint, or parquet under
    * `materializePath` for the cluster-durable form) — without the cut,
    * round k would replay rounds 1..k-1. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, damping: Double = 0.85,
      materializePath: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    // one rebalanced grouped-count pass (the repartition keys match the
    // groupBy, so the aggregation reuses the exchange), materialized
    // once — e otherwise recomputes for both the ow aggregation and the
    // weighted-edge join. ew checkpoints PRE-PARTITIONED on src:
    // localCheckpoint preserves the hash partitioning, so none of the
    // `iterations` contribution joins re-shuffles the edge list — only
    // the (node-count-sized) rank frame moves per round.
    val eIn = Pipeline.cpuRebalance(edges, col(srcCol), col(dstCol))
    // width for the per-iteration join stages, sized on the PRE-
    // checkpoint frame (a checkpointed frame has no stats and cpuWidth
    // would fall back to the wide cap — the round-14 near-empty-task
    // trap) at a join-shaped 4 MB/task rather than the gram-kernel
    // 256 KB/task: session width at gate scale, growing with the edge
    // bytes at 10x/100x
    val ewWidth = Pipeline.cpuWidthLeaf(eIn, bytesPerTask = 4L << 20)
    // out-weight via a src-partitioned window instead of the former
    // e ⋈ (e groupBy src) self-join: one exchange, no duplicated edge
    // aggregation, and ONE materialization. The checkpoint lands
    // PRE-PARTITIONED on src (localCheckpoint preserves partitioning),
    // so none of the `iterations` contribution joins re-shuffles the
    // edge list — only the (node-count-sized) rank frame moves per
    // round. Per-src window state is bounded by the max out-degree.
    val ew = Dedup.materializeBase(
      eIn.groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
        .agg(count(lit(1)).as("w"))
        .repartition(ewWidth, col("src"))
        .withColumn("ow", sum(col("w")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src")))),
      None)
    val nodes = Dedup.materializeBase(
      ew.select(col("src").as("node"))
        .unionByName(ew.select(col("dst").as("node"))).distinct(), None)
    var ranks = nodes.withColumn("r", lit(1.0))
    for (i <- 1 to iterations) {
      val contrib = ew.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          (((col("r") * damping) * col("w").cast("double")) /
            col("ow").cast("double")).cast("decimal(28,14)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      ranks = Dedup.materializeBase(
        nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(1.0 - damping) +
              coalesce(col("inflow").cast("double"), lit(0.0))).as("r")),
        materializePath.map(p => s"$p/iter$i"))
    }
    ranks.select(col("node"), col("r").as("rank"))
  }

  /** Exact triangle count over the undirected simple graph of `edges`
    * (parallel edges collapse, self-loops drop) — the clustering /
    * community-density signal (a link farm and an organic topic cluster
    * have very different triangle densities at equal edge counts).
    *
    * Scale shape: DEGREE-ORDERED orientation (each edge points from its
    * (degree, id)-smaller endpoint to the larger) before the wedge
    * self-join — the classic distributed-triangle trick: every node's
    * out-degree is O(√m), so the wedge count is Σ outdeg² ≤ m^1.5
    * instead of Σ deg² (which a hub node makes quadratic). Each triangle
    * is counted exactly once: orientation by a total order is acyclic,
    * and exactly one of the three nodes holds both out-edges. Three
    * equi-shuffles (degree agg, wedge self-join on the apex, closing-
    * edge join); counts are exact integers.
    *
    * Returns a single row (n_nodes, n_edges, n_triangles). */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("n"))
      .unionByName(und.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val und2 = Dedup.materializeBase(
      und
        .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
        .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v")),
      None)
    // orient by the (deg, id) total order; carry the head's degree so the
    // closing pair can be oriented without another degree join
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = und2.select(
      when(uFirst, col("u")).otherwise(col("v")).as("a"),
      when(uFirst, col("v")).otherwise(col("u")).as("b"),
      when(uFirst, col("dv")).otherwise(col("du")).as("db"))
    // pin the wedge join's partition count: AQE sizes partitions by the
    // INPUT bytes of the edge list, but the join's output is the wedge
    // expansion (outdeg² per apex) — letting AQE coalesce the small edge
    // shuffle funnels the expansion through a handful of tasks. An
    // explicit repartition(n, apex) keeps the expansion spread.
    val p = und2.sparkSession.sessionState.conf.numShufflePartitions
    val byApex = oriented.repartition(p, col("a"))
    val wedges = byApex.select(col("a"), col("b").as("x"), col("db").as("dx"))
      .join(byApex.select(col("a"), col("b").as("y"), col("db").as("dy")),
        Seq("a"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("x").as("a"), col("y").as("b"))
    val triangles = wedges.join(oriented.select("a", "b"), Seq("a", "b"))
    und2.agg(count(lit(1)).as("n_edges")).crossJoin(
        deg.agg(count(lit(1)).as("n_nodes")))
      .crossJoin(triangles.agg(count(lit(1)).as("n_triangles")))
      .select("n_nodes", "n_edges", "n_triangles")
  }

  /** Semi-supervised LABEL PROPAGATION (Zhu & Ghahramani 2002 / Raghavan
    * et al. 2007, synchronized + deterministic): a labeled seed subset
    * spreads over the graph; each round, every non-seed node takes the
    * MAJORITY label among its labeled neighbors (ties → lexicographically
    * smallest label — no RNG, unlike classic async LPA), seeds stay
    * pinned, and a node with no labeled neighbor keeps its previous
    * label (labels monotonically spread outward, never vanish). The
    * category-completion / taxonomy-spread primitive: "label 5% of the
    * catalog, infer the rest from co-purchase structure".
    *
    * Scale shape per round: ONE edge⋈labels equi-join + ONE (node,
    * label) count aggregation + the argmax over per-node label SUMMARIES
    * (a window over rows bounded by the node's distinct neighbor-label
    * count — the [[Behavior.eventTransitions]] summary-window
    * discipline, never a window over raw edges), then a left join back
    * onto the node set. Every shuffle keys on a node id. Each round's
    * labels are materialized ([[Dedup.materializeBase]]) — iteration
    * lineage never re-executes (the pageRank discipline). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, nodeCol: String, labelCol: String,
      iterations: Int = 2,
      materializePath: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val half = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
    val und = Dedup.materializeBase(
      half.unionByName(half.select(col("dst").as("src"),
        col("src").as("dst"))).distinct(),
      materializePath.map(_ + "/edges"))
    val seed = seeds.select(col(nodeCol).as("node"),
      col(labelCol).as("__seed"))
    val nodes = Dedup.materializeBase(
      und.select(col("src").as("node")).distinct()
        .join(seed, Seq("node"), "left"),
      materializePath.map(_ + "/nodes"))
    var labels = nodes.select(col("node"), col("__seed").as("lbl"))
    for (i <- 1 to iterations) {
      val nb = und
        .join(labels.select(col("node").as("dst"), col("lbl")), "dst")
        .filter(col("lbl").isNotNull)
        .groupBy(col("src"), col("lbl"))
        .agg(count(lit(1)).as("__c"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src"))
        .orderBy(col("__c").desc, col("lbl").asc)
      val prop = nb.withColumn("__rn", row_number().over(win))
        .filter(col("__rn") === 1)
        .select(col("src").as("node"), col("lbl").as("__p"))
      labels = Dedup.materializeBase(
        nodes.select(col("node"), col("__seed"))
          .join(labels.select(col("node"), col("lbl").as("__prev")),
            Seq("node"))
          .join(prop, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__seed"), col("__p"), col("__prev")).as("lbl")),
        materializePath.map(p => s"$p/iter$i"))
    }
    labels.select(col("node"),
      col("lbl").as("label"))
  }

  /** Common-neighbor LINK-PREDICTION features for every 2-hop pair —
    * common-neighbor count, Adamic–Adar Σ 1/ln(deg(z)) over shared
    * neighbors z (Adamic & Adar 2003 — a shared OBSCURE neighbor is
    * strong evidence, a shared hub is none), neighborhood Jaccard, and
    * whether the pair is already an edge (candidate generation scores
    * NON-edges; existing edges ride along as the calibration set).
    *
    * Scale shape: wedge generation is the [[triangleCount]] apex
    * self-join — quadratic in apex degree, so an in-plan `raise_error`
    * fires when any node's degree exceeds `maxDegree` (the hot-basket
    * discipline: one hub must not silently quadratic the join — cap or
    * pre-filter hubs, which for AA is also the STATISTICALLY right move
    * since a hub's 1/ln(deg) term is noise). Three equi-shuffles: the
    * degree aggregation, the wedge self-join on the apex, the pair
    * aggregation; degree joins ride pair-frame-sized equi-joins.
    *
    * Exactness: AA terms round to 10 dp and quantize to DECIMAL(28,14)
    * (order-invariant sums, the [[graft.ops.Stats.mutualInfo]]
    * discipline); Jaccard = cn/(deg_a + deg_b − cn) is one double
    * division of exact integers; 6-dp renders. */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
      maxDegree: Long = 10000L, minCommon: Long = 2L): DataFrame = {
    require(maxDegree >= 2L, s"maxDegree must be >= 2, got $maxDegree")
    require(minCommon >= 1L, s"minCommon must be >= 1, got $minCommon")
    val und = Dedup.materializeBase(
      edges
        .select(least(col(srcCol), col(dstCol)).as("u"),
          greatest(col(srcCol), col(dstCol)).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct(),
      None)
    // deg feeds the guard join and (via nb) the score columns, nb feeds
    // both wedge sides — materialize each once instead of re-running the
    // degree aggregation / guard join per consumer (round-15 audit:
    // duplicated subtree passes dominated the gate)
    val deg = Dedup.materializeBase(
      und.select(col("u").as("node"))
        .unionByName(und.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg")), None)
    // nb carries BOTH endpoint degrees: the apex's (deg — the guard and
    // the AA term) and the neighbor's (__nd — the round-15-verdict
    // endpoint prune below). NOTE a checkpoint taken under AQE reports
    // UnknownPartitioning (measured round 16: a pre-partitioned
    // checkpoint did NOT let the self-join reuse the layout), so the
    // wedge width is pinned on the join sides below instead.
    val wedgeWidth = Pipeline.cpuWidthLeaf(edges, bytesPerTask = 1L << 20)
    val und2 = und
      .join(deg.select(col("node").as("u"), col("deg").as("__du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("__dv")), Seq("v"))
    val nb = Dedup.materializeBase(
      und2.select(col("u").as("node"), col("__du").as("deg"),
          col("v").as("nbr"), col("__dv").as("__nd"))
        .unionByName(und2.select(col("v").as("node"), col("__dv").as("deg"),
          col("u").as("nbr"), col("__du").as("__nd")))
        .withColumn("nbr", when(col("deg") <= maxDegree, col("nbr"))
          .otherwise(raise_error(concat(lit("adamicAdar: node "),
            col("node").cast("string"), lit(" has degree "),
            col("deg").cast("string"),
            lit(s" > maxDegree=$maxDegree — the wedge self-join is" +
              " quadratic per apex; pre-filter hub nodes or raise" +
              " maxDegree"))))), None)
    // endpoint prune: common_neighbors(a,b) <= min(deg(a), deg(b)), so a
    // wedge endpoint with degree < minCommon can never survive the
    // minCommon filter — drop it BEFORE the quadratic self-join. A pure
    // subset of the work, bit-identical output.
    val pruned = nb.filter(col("__nd") >= minCommon)
    val term = when(col("deg") >= 2L,
      round(lit(1.0) / log(col("deg").cast("double")), 10)
        .cast("decimal(28,14)"))
    // the wedge shuffle is the operator's volume (Σ outdeg² rows, ~33×
    // the edge count here) and ~97% of wedge groups are singletons, so
    // partial aggregation combines almost nothing — keep the shuffled
    // row as narrow as possible (guide §2.3): (na, nb2, __t) only; the
    // endpoint degrees re-attach AFTER the >=minCommon filter via two
    // broadcast-sized joins against the (node-count-sized) deg frame.
    // pin the wedge join's width (AQE-exempt): the join's OUTPUT is the
    // quadratic expansion, but AQE sizes the exchange by its edge-list
    // INPUT bytes and coalesced it to 10 tasks (round-16 audit, the
    // triangleCount lesson). Both sides pinned to the same width keeps
    // the join exchange-aligned; the shuffled frames are edge-sized.
    val left = pruned.select(col("node"), col("nbr").as("na"), term.as("__t"))
      .repartition(wedgeWidth, col("node"))
    val right = pruned.select(col("node"), col("nbr").as("nb2"))
      .repartition(wedgeWidth, col("node"))
    val pairs = left.join(right, Seq("node"))
      .filter(col("na") < col("nb2"))
      .groupBy(col("na").as("node_a"), col("nb2").as("node_b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("__t")).as("__aa"))
      .filter(col("common_neighbors") >= minCommon)
    pairs
      .join(deg.select(col("node").as("node_a"), col("deg").as("__da")),
        Seq("node_a"))
      .join(deg.select(col("node").as("node_b"), col("deg").as("__db")),
        Seq("node_b"))
      .join(und.select(col("u").as("node_a"), col("v").as("node_b"),
        lit(true).as("__e")), Seq("node_a", "node_b"), "left")
      .select(col("node_a"), col("node_b"), col("common_neighbors"),
        round(col("__aa").cast("double"), 6).as("aa_score"),
        round(col("common_neighbors").cast("double") /
          (col("__da") + col("__db") - col("common_neighbors"))
            .cast("double"), 6).as("jaccard"),
        coalesce(col("__e"), lit(false)).as("is_edge"))
      // pair-list-sized result, materialized so a caller's orderBy
      // range-sampling cannot re-run the wedge aggregation (round-16
      // audit: the final agg stage executed twice, ~19 task-sec)
      .localCheckpoint()
  }
}

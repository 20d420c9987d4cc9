package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A real IVF (inverted-file) ANN index built with DataFrame ops only:
  *
  *  - coarse quantizer: k-means via Lloyd iterations where the element-wise
  *    means accumulate in DECIMAL — exact arithmetic, so centroids (and
  *    hence cell assignments) are deterministic under any partitioning;
  *    init is a deterministic hash-partition of ids;
  *  - index: each corpus vector stored under its nearest-centroid cell
  *    (this is the table you'd bucket/partition by cell at 100 TB);
  *  - search: queries rank cells by centroid similarity, probe the top
  *    `nProbe` cells, and exact-score only the vectors inside — scanning
  *    nProbe/nCells of the corpus instead of all of it.
  */
object IvfIndex {

  /** Deterministic element-wise mean per cell: posexplode to (cell, dim),
    * DECIMAL-exact sums cast to double before the division — the exact sum
    * makes centroids partition-invariant, and double-division of the exact
    * sum is the form any SQL oracle reproduces bit-for-bit (engine-specific
    * decimal division scale rules never enter). */
  private def exactCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("v")))
      .groupBy("cell", "pos")
      .agg((sum(col("col").cast("decimal(28,14)")).cast("double") / count(lit(1))).as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
        .getField("m").as("centroid"))

  /** Argmin assignment via a single kernel over the centroid matrix (a
    * task-broadcast reference, not nCells × dim literal expressions —
    * which would be pathological at real IVF sizes). Bit-identical to the
    * declarative struct-min form (same fold order, ties to smaller cell). */
  private def nearestCell(v: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    graft.functions.NearestCellExpr.nearestCell(
      org.apache.spark.sql.SparkSession.active, v, centroids)

  /** Build the index: returns (assignments(cell, id, v), centroids).
    *
    * `initCell` overrides the deterministic init assignment (a Column over
    * the renamed `id` column; default hash-partition of ids). The gate
    * query passes a plain modulo so the whole Lloyd pipeline is
    * SQL-oracle-replicable; production keeps the hash init.
    *
    * `trainFraction` < 1 trains the quantizer on a deterministic hash
    * sample of the corpus — Lloyd iterations then scan only the sample and
    * the full corpus is assigned ONCE at the end, the standard shape at
    * scale (a quantizer needs a representative sample, not every row). */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, iters: Int = 2,
      initCell: Option[Column] = None,
      trainFraction: Double = 1.0): (DataFrame, Seq[(Int, Seq[Double])]) = {
    val base = corpus.select(col(idCol).as("id"),
      Similarity.toDouble(col(vecCol)).as("v"))
    val train =
      if (trainFraction >= 1.0) base
      else base.filter(pmod(xxhash64(col("id")), lit(10000L)) <
        lit((trainFraction * 10000).toLong))
    val init = initCell.getOrElse(
      pmod(xxhash64(col("id")), lit(nCells.toLong)).cast("int"))
    var trainAssigned = train.withColumn("cell", init)
    var centroids: Seq[(Int, Seq[Double])] = Nil
    for (_ <- 0 until iters) {
      centroids = exactCentroids(trainAssigned)
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toSeq.sortBy(_._1)
      trainAssigned = train.withColumn("cell", nearestCell(col("v"), centroids))
    }
    if (iters == 0) {
      // no Lloyd refinement: keep the init assignment, but still publish
      // centroids (means of the init cells) so search() can rank probes.
      // Means come from the FULL corpus under init, not the train sample:
      // with trainFraction<1 an init cell absent from the sample would get
      // no centroid and its vectors would be unreachable at search time.
      centroids = exactCentroids(base.withColumn("cell", init))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toSeq.sortBy(_._1)
      (base.withColumn("cell", init), centroids)
    } else
      // one full-corpus assignment pass with the final centroids
      (base.withColumn("cell", nearestCell(col("v"), centroids)), centroids)
  }

  /** Persist a built index: assignments written PARTITIONED BY CELL — the
    * on-disk analogue of the inverted file. A search against the loaded
    * index joins assignments to the (broadcast) probed cells on the
    * partition column, so dynamic partition pruning reads only the probed
    * cells' files instead of the corpus — the property that makes a
    * persisted 100 TB index useful (build once, probe cheaply forever).
    * Centroids ride as a small parquet table next to it. */
  def save(assigned: DataFrame, centroids: Seq[(Int, Seq[Double])],
      dir: String): Unit = {
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/assignments")
    val spark = assigned.sparkSession
    import spark.implicits._
    centroids.toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Load a persisted index in the (assignments, centroids) shape build()
    * returns; search() runs on it unchanged. */
  def load(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, Seq[(Int, Seq[Double])]) = {
    val assigned = spark.read.parquet(s"$dir/assignments")
      .select(col("cell").cast("int").as("cell"), col("id"), col("v"))
    val centroids = spark.read.parquet(s"$dir/centroids")
      .collect()
      .map(r => r.getInt(r.fieldIndex("cell")) ->
        r.getSeq[Double](r.fieldIndex("centroid")).toSeq)
      .toSeq.sortBy(_._1)
    (assigned, centroids)
  }

  /** Probe-and-score search over a built index. */
  def search(assigned: DataFrame, centroids: Seq[(Int, Seq[Double])],
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nProbe: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(queryId).as("q_id"),
      Similarity.toDouble(col(queryVec)).as("q_v"))
    // rank cells per query by centroid dot product, keep top nProbe — via
    // the codegen top-k kernel (task-broadcast matrix; the literal
    // slice(array_sort(...)) form it replaces built nCells × dim literal
    // expressions, pathological at real IVF sizes). Bit-identical ranking:
    // same dot fold, descending similarity, ties to the smaller cell.
    val spark = org.apache.spark.sql.SparkSession.active
    val probed = q.withColumn("probes",
        graft.functions.NearestCellExpr.nearestCellsTopK(
          spark, col("q_v"), centroids,
          math.min(nProbe, centroids.size)))
      .select(col("q_id"),
        graft.functions.PackedDoubles.packCol(spark, col("q_v")).as("q_vp"),
        Similarity.norm(col("q_v")).as("q_nrm"),
        explode(col("probes")).as("cell"))
    // packed vectors + per-row norms; the per-pair dot runs in the codegen
    // kernel (bit-identical to the declarative sequential fold)
    var scored = assigned
      .select(col("cell"), col("id"),
        graft.functions.PackedDoubles.packCol(spark, col("v")).as("vp"),
        Similarity.norm(col("v")).as("nrm"))
      .join(broadcast(probed), Seq("cell"))
      .withColumn("sim",
        graft.functions.PackedDoubles.dotCol(spark, col("vp"), col("q_vp")) /
          (col("nrm") * col("q_nrm")))
      .select(col("q_id"), col("id").as("n_id"), col("sim"))
    if (excludeSelf) scored = scored.filter(col("q_id") =!= col("n_id"))
    Similarity.topKPerGroup(scored, "q_id", "n_id", "sim", k)
  }
}

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

  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Deterministic element-wise mean per cell: posexplode to (cell, dim),
    * DECIMAL-exact sums, rebuild ordered arrays. */
  private def exactCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("v")))
      .groupBy("cell", "pos")
      .agg((sum(col("col").cast("decimal(28,14)")) / count(lit(1))).cast("double").as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
        .getField("m").as("centroid"))

  private def nearestCell(v: Column, centroids: Seq[(Int, Seq[Double])]): Column = {
    val scored = centroids.map { case (cell, c) =>
      struct((lit(-1.0) * dotD(v, array(c.map(lit): _*))).as("negSim"),
        lit(cell).as("cell"))
    }
    array_min(array(scored: _*)).getField("cell")
  }

  /** Build the index: returns (assignments(cell, id, v), centroids). */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, iters: Int = 2): (DataFrame, Seq[(Int, Seq[Double])]) = {
    val base = corpus.select(col(idCol).as("id"),
      Similarity.toDouble(col(vecCol)).as("v"))
    // deterministic init: hash-partition ids into cells
    var assigned = base.withColumn("cell",
      pmod(xxhash64(col("id")), lit(nCells.toLong)).cast("int"))
    var centroids: Seq[(Int, Seq[Double])] = Nil
    for (_ <- 0 until iters) {
      centroids = exactCentroids(assigned)
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toSeq.sortBy(_._1)
      assigned = base.withColumn("cell", nearestCell(col("v"), centroids))
    }
    (assigned, centroids)
  }

  /** Probe-and-score search over a built index. */
  def search(assigned: DataFrame, centroids: Seq[(Int, Seq[Double])],
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nProbe: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(queryId).as("q_id"),
      Similarity.toDouble(col(queryVec)).as("q_v"))
    // rank cells per query by centroid dot product, keep top nProbe
    val cellScores = centroids.map { case (cell, c) =>
      struct((lit(-1.0) * dotD(col("q_v"), array(c.map(lit): _*))).as("negSim"),
        lit(cell).as("cell"))
    }
    val probed = q.withColumn("probes",
        slice(array_sort(array(cellScores: _*)), 1, nProbe).getField("cell"))
      .select(col("q_id"), col("q_v"), explode(col("probes")).as("cell"))
    var scored = assigned.join(broadcast(probed), Seq("cell"))
      .withColumn("sim", dotD(col("v"), col("q_v")) /
        (Similarity.norm(col("v")) * Similarity.norm(col("q_v"))))
      .select(col("q_id"), col("id").as("n_id"), col("sim"))
    if (excludeSelf) scored = scored.filter(col("q_id") =!= col("n_id"))
    Similarity.topKPerGroup(scored, "q_id", "n_id", "sim", k)
  }
}

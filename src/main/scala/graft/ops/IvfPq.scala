package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-PQ: the production billion-vector ANN shape, composed from the two
  * indexes this library already builds — an IVF coarse quantizer
  * ([[IvfIndex]]) prunes WHICH rows a query scans (nProbe/nCells of the
  * corpus), and residual product quantization ([[PqIndex]]) shrinks WHAT
  * each scanned row costs (m code lookups instead of a dim-float dot).
  *
  * Residual encoding: each vector stores PQ codes of (v − centroid[cell]),
  * not of v itself — residuals concentrate near zero, so the same codebook
  * budget quantizes them far more accurately, and the dot product
  * decomposes exactly:
  *
  *   dot(q, v) ≈ dot(q, c_cell) + Σ_s LUT_q[code_s]
  *
  * where LUT_q holds dot(q_sub, residual-codebook centroid) per subspace —
  * one [[graft.functions.PqLutExpr]] kernel evaluation per query.
  *
  * Search never shuffles the code table: queries (with their probe lists,
  * LUTs, and per-probed-cell centroid dots — all computed on the tiny
  * query side) BROADCAST onto the codes, the join on `cell` prunes to the
  * probed cells (partition/file pruning when the codes table is persisted
  * `partitionBy("cell")`, same as [[IvfIndex.save]]), and the bounded
  * top-k aggregation is the only exchange.
  *
  * Every stage inherits the DECIMAL-exact Lloyd trainer, so with a modulo
  * init the entire pipeline — coarse cells, residuals, codebooks, codes,
  * probes, ADC scores, ranking — is replicable by a SQL oracle.
  */
object IvfPq {

  /** Train both quantizers and encode the corpus. Returns
    * (codes(id, cell, code), coarse centroids, residual codebooks).
    * `initCell` seeds BOTH Lloyd inits (coarse cells and each residual
    * subspace codebook — a Column over the renamed `id`; default hash
    * init); `trainFraction` samples both training scans. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, m: Int, ksub: Int,
      ivfIters: Int = 1, pqIters: Int = 1,
      initCell: Option[Column] = None,
      trainFraction: Double = 1.0,
      materializePath: Option[String] = None)
      : (DataFrame, Seq[(Int, Seq[Double])], PqIndex.Codebooks) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (assigned, cents) = IvfIndex.build(corpus, idCol, vecCol, nCells,
      ivfIters, initCell, trainFraction)
    val cdf = broadcast(cents.toDF("cell", "cvec"))
    // the residual frame feeds every subspace training, the encode pass
    // and (via codes) the search — materialize it once instead of
    // re-running the coarse assignment per consumer (parquet under
    // `materializePath` for the cluster-safe form)
    val res = Dedup.materializeBase(
      assigned.join(cdf, "cell")
        .select(col("id"), col("cell"),
          zip_with(col("v"), col("cvec"), (a, b) => a - b).as("r")),
      materializePath)
    val (_, books) = PqIndex.build(res, "id", "r", m, ksub, pqIters,
      initCell, trainFraction)
    val codes = res.select(col("id"), col("cell"),
      PqIndex.encodeCol(spark, col("r"), books).as("code"))
    (codes, cents, books)
  }

  /** Persist a built index: codes PARTITIONED BY CELL (the on-disk
    * inverted file, as [[IvfIndex.save]]) — a search against the loaded
    * index joins codes to the broadcast probed cells on the partition
    * column, so only the probed cells' files are read. Coarse centroids
    * and the flattened residual codebooks ride as small parquet tables. */
  def save(codes: DataFrame, cents: Seq[(Int, Seq[Double])],
      books: PqIndex.Codebooks, dir: String): Unit = {
    val spark = codes.sparkSession
    import spark.implicits._
    codes.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
    cents.toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    books.books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (cent, pos) => (s, pos, books.dsub, cent) }
    }.toDF("subspace", "pos", "dsub", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  /** Load a persisted index in the (codes, centroids, codebooks) shape
    * build() returns; search() runs on it unchanged. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String)
      : (DataFrame, Seq[(Int, Seq[Double])], PqIndex.Codebooks) = {
    val codes = spark.read.parquet(s"$dir/codes")
      .select(col("cell").cast("int").as("cell"), col("id"), col("code"))
    val cents = spark.read.parquet(s"$dir/centroids")
      .collect()
      .map(r => r.getInt(r.fieldIndex("cell")) ->
        r.getSeq[Double](r.fieldIndex("centroid")).toSeq)
      .toSeq.sortBy(_._1)
    val rows = spark.read.parquet(s"$dir/codebooks").collect()
      .map(r => (r.getInt(r.fieldIndex("subspace")), r.getInt(r.fieldIndex("pos")),
        r.getInt(r.fieldIndex("dsub")),
        r.getSeq[Double](r.fieldIndex("centroid")).toSeq))
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, bs) => bs.sortBy(_._2).map(_._4).toSeq }
    (codes, cents, PqIndex.Codebooks(books.size, rows.head._3, books))
  }

  /** Probe + ADC search: per query, the top-`nProbe` cells by centroid
    * dot (the [[graft.functions.NearestCellExpr.nearestCellsTopK]]
    * kernel), the residual LUT, and dot(q, centroid) per probed cell are
    * all computed query-side and broadcast; each code row in a probed
    * cell scores as cdot + LUT lookups summed left-to-right (cdot, then
    * subspace order — the exact fold the oracle writes out). */
  def search(codes: DataFrame, cents: Seq[(Int, Seq[Double])],
      books: PqIndex.Codebooks,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nProbe: Int, excludeSelf: Boolean = true): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val q = queries.select(col(queryId).as("q_id"),
        Similarity.toDouble(col(queryVec)).as("q_v"))
      .withColumn("probes", graft.functions.NearestCellExpr.nearestCellsTopK(
        spark, col("q_v"), cents, math.min(nProbe, cents.size)))
      .withColumn("lut",
        graft.functions.PqExprs.pqLut(spark, col("q_v"), books.books, books.dsub))
    val cdf = cents.toDF("cell", "cvec")
    val probed = q.select(col("q_id"), col("q_v"), col("lut"),
        explode(col("probes")).as("cell"))
      .join(cdf, "cell")
      .select(col("q_id"), col("cell"), col("lut"),
        Similarity.dot(col("q_v"), col("cvec")).as("cdot"))
    val offsets = books.books.map(_.size).scanLeft(0)(_ + _).dropRight(1)
    val terms = (0 until books.m).map { s =>
      element_at(col("lut"), col("code").getItem(s) + offsets(s) + 1)
    }
    var scored = codes.join(broadcast(probed), Seq("cell"))
      .withColumn("score", (col("cdot") +: terms).reduce(_ + _))
      .select(col("q_id"), col("id").as("n_id"), col("score"))
    if (excludeSelf) scored = scored.filter(col("q_id") =!= col("n_id"))
    Similarity.topKPerGroup(scored, "q_id", "n_id", "score", k)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) with asymmetric-distance (ADC) search — the
  * memory half of the 100 TB ANN stack. IVF ([[IvfIndex]]) prunes which
  * vectors a query scans; PQ shrinks what each resident vector costs: a
  * dim-float vector becomes m small codes (dim=64 floats = 256 B → m=2
  * ints here; at production sizes 768 floats = 3 KB → 8 bytes, ~384×),
  * so the scan reads codes, not vectors.
  *
  * Each vector splits into m equal `dsub`-dim subvectors; each subspace
  * trains its own codebook with the SAME deterministic DECIMAL-exact Lloyd
  * trainer the IVF coarse quantizer uses ([[IvfIndex.build]] over the
  * sliced column), inheriting its partition-invariance and SQL-oracle
  * replicability. Codebook entries are re-labelled by position (ascending
  * original cell id), so codes are dense indices into the codebook.
  *
  * ADC search: per QUERY, one codegen kernel ([[graft.functions.PqLutExpr]],
  * task-broadcast codebooks — never m × ksub × dsub literal expressions)
  * computes the lookup table of subspace-centroid dot products; each
  * corpus row then scores with m array lookups summed in subspace order —
  * an approximation of the full dot product whose every term is exact
  * double arithmetic a SQL oracle reproduces.
  */
object PqIndex {

  /** Position-indexed per-subspace codebooks (m books of up to ksub
    * centroids, each `dsub` dims). */
  final case class Codebooks(m: Int, dsub: Int, books: Seq[Seq[Seq[Double]]])

  /** Train codebooks and encode the corpus: returns
    * (codes(id, code: array<int>), codebooks). `initCell` seeds each
    * subspace's Lloyd init (a Column over the renamed `id` column — the
    * gate passes a modulo for oracle replicability; default hash init);
    * `trainFraction` trains each codebook on a deterministic sample.
    * The per-subspace [[IvfIndex.build]] assignment frames are lazy and
    * discarded — only the collected codebooks execute, then ONE pass
    * encodes all m subspaces. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 2,
      initCell: Option[Column] = None,
      trainFraction: Double = 1.0): (DataFrame, Codebooks) = {
    require(m >= 1, s"m must be >= 1, got $m")
    val spark = corpus.sparkSession
    val base = corpus.select(col(idCol).as("id"),
      Similarity.toDouble(col(vecCol)).as("v"))
    val dim = base.select(size(col("v")).as("d")).head.getInt(0)
    require(dim % m == 0, s"embedding dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    val books: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      val sub = base.select(col("id"), slice(col("v"), s * dsub + 1, dsub).as("sub"))
      val (_, cents) = IvfIndex.build(sub, "id", "sub", ksub, iters,
        initCell = initCell, trainFraction = trainFraction)
      // dense position labels in ascending original-cell order: ties in
      // the argmin kernel ("smaller cell first") keep the same winner
      cents.sortBy(_._1).map(_._2)
    }
    val cb = Codebooks(m, dsub, books)
    (base.select(col("id"), encodeCol(spark, col("v"), cb).as("code")), cb)
  }

  /** Codes column (array<int>, one dense code per subspace) for a
    * double-array vector column against trained codebooks — the single
    * encode kernel both the standalone PQ path and the IVF-PQ residual
    * path run. */
  def encodeCol(spark: org.apache.spark.sql.SparkSession, vec: Column,
      books: Codebooks): Column =
    array((0 until books.m).map { s =>
      graft.functions.NearestCellExpr.nearestCell(spark,
        slice(vec, s * books.dsub + 1, books.dsub),
        books.books(s).zipWithIndex.map { case (cent, pos) => pos -> cent })
    }: _*)

  /** ADC top-k: score = sum over subspaces of LUT[offset_s + code_s],
    * terms added in subspace order (t0 + t1 + ... — the exact form the
    * oracle writes out). The query table (with its LUT) broadcasts; the
    * code table is the only large operand and it never shuffles before
    * the bounded top-k aggregation. */
  def searchAdc(codes: DataFrame, books: Codebooks,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val spark = codes.sparkSession
    val offsets = books.books.map(_.size).scanLeft(0)(_ + _).dropRight(1)
    val q = queries.select(col(queryId).as("q_id"),
        Similarity.toDouble(col(queryVec)).as("q_v"))
      .select(col("q_id"),
        graft.functions.PqExprs.pqLut(spark, col("q_v"), books.books, books.dsub)
          .as("lut"))
    var scored = codes.crossJoin(broadcast(q))
      .withColumn("score", (0 until books.m).map { s =>
        element_at(col("lut"), col("code").getItem(s) + offsets(s) + 1)
      }.reduce(_ + _))
      .select(col("q_id"), col("id").as("n_id"), col("score"))
    if (excludeSelf) scored = scored.filter(col("q_id") =!= col("n_id"))
    Similarity.topKPerGroup(scored, "q_id", "n_id", "score", k)
  }
}

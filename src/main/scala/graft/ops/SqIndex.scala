package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension uniform int8) quantization — the third member of
  * the compression family ([[PqIndex]] product codes, [[IvfPq]] residual
  * codes): each float dimension maps independently onto 256 levels between
  * the corpus-wide per-dimension min and max, so a dim-float vector costs
  * dim bytes (4× smaller than float32) with NO codebook training — the
  * cheap-and-cheerful compression tier ANN systems offer below PQ
  * (e.g. Faiss ScalarQuantizer / Lucene int8 HNSW).
  *
  * Everything is engine-exact double arithmetic: per-dim min/max of floats
  * is exact, the affine code `floor((x−min)·255/(max−min) + 0.5)` and the
  * reconstruction `min + code·step` are correctly-rounded IEEE ops, and the
  * asymmetric score `Σ_d q_d · dq_d` folds in ascending-dimension order —
  * a SQL oracle reproduces every code and score bit for bit.
  *
  * Scale shape: training is ONE narrow aggregation (min/max per dimension
  * — dim-bounded driver state, the centroid-collect pattern); encoding is
  * a pure projection; search broadcasts the query set and scans codes with
  * a bounded [[Similarity.topKPerGroup]] — the code table never shuffles.
  */
object SqIndex {

  /** Per-dimension quantization grid: mins/steps with step = (max−min)/255
    * (0 for constant dimensions — every value encodes to 0 and
    * reconstructs to the constant). */
  final case class SqParams(mins: Seq[Double], steps: Seq[Double])

  /** One narrow pass: per-dimension min/max over the corpus (exact — no
    * sampling; min/max combine map-side and the collected state is one row
    * per dimension). */
  def train(corpus: DataFrame, vecCol: String): SqParams = {
    val byDim = corpus
      .select(posexplode(Similarity.toDouble(col(vecCol))).as(Seq("__d", "__x")))
      .groupBy("__d")
      .agg(min("__x").as("mn"), max("__x").as("mx"))
      .orderBy("__d")
      .collect()
    val mins = byDim.map(_.getDouble(1)).toSeq
    val steps = byDim.map(r => (r.getDouble(2) - r.getDouble(1)) / 255.0).toSeq
    SqParams(mins, steps)
  }

  /** int8 codes (array<int>, values 0..255): round-half-up onto the grid,
    * clamped so out-of-train-range vectors still encode. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      p: SqParams): DataFrame = {
    val minsArr = typedlit(p.mins)
    val stepsArr = typedlit(p.steps)
    df.select(col(idCol).as("id"),
      transform(Similarity.toDouble(col(vecCol)), (x, i) => {
        val step = element_at(stepsArr, i + 1)
        val c = floor((x - element_at(minsArr, i + 1)) / step + lit(0.5))
        when(step === 0.0, lit(0))
          .otherwise(greatest(lit(0), least(lit(255), c.cast("int"))))
      }).as("code"))
  }

  /** Asymmetric top-k: the float query against RECONSTRUCTED corpus values
    * (`min_d + code_d·step_d`), scored `Σ q_d·dq_d` left-to-right — the
    * fold order the oracle writes out. Queries broadcast; the grid rides
    * the plan as two dim-length literal arrays (plan size O(dim), nothing
    * per-row). */
  def searchAdc(codes: DataFrame, p: SqParams,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val minsArr = typedlit(p.mins)
    val stepsArr = typedlit(p.steps)
    val q = queries.select(col(queryId).as("q_id"),
      Similarity.toDouble(col(queryVec)).as("q_v"))
    var scored = codes.crossJoin(broadcast(q))
      .withColumn("score", aggregate(
        zip_with(col("q_v"),
          transform(col("code"), (c, i) =>
            element_at(minsArr, i + 1) +
              c.cast("double") * element_at(stepsArr, i + 1)),
          (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x))
      .select(col("q_id"), col("id").as("n_id"), col("score"))
    if (excludeSelf) scored = scored.filter(col("q_id") =!= col("n_id"))
    Similarity.topKPerGroup(scored, "q_id", "n_id", "score", k)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25: exact parity with a driver-side re-computation (including the
  * DECIMAL(28,14) per-term rounding), self-retrieval sanity, partition
  * invariance, and the broadcast-only scoring plan. */
class RetrievalSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = Seq(
    1L -> "spark shuffles data across the cluster",
    2L -> "the cluster runs spark jobs",
    3L -> "data pipelines clean data for training",
    4L -> "an unrelated sentence about cats",
    5L -> "spark spark spark everywhere")

  test("scores match a driver-side BM25 with decimal term rounding") {
    val queries = docs(100L -> "spark data", 200L -> "cats")
    val got = Retrieval.bm25TopK(docs(corpus: _*), "doc_id", "text",
        queries, "doc_id", "text", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3))
      .toMap
    // recompute: same formula, same parenthesization, DECIMAL(28,14) sum
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    }
    val n = toks.size
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    def bm25(qTerms: Seq[String]): Map[Long, Double] =
      toks.flatMap { case (id, ts) =>
        val dl = ts.size
        val terms = qTerms.distinct.flatMap { term =>
          val tf = ts.count(_ == term)
          if (tf == 0) None else {
            val dfreq = toks.count(_._2.contains(term)).toDouble
            val idf = math.log((n.toDouble - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
            val x = idf * ((tf.toDouble * 2.2) /
              (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))))
            // Spark's double->decimal cast goes through the SHORTEST
            // decimal rep (BigDecimal.valueOf), so mirror exactly that
            Some(scala.math.BigDecimal(x)
              .setScale(14, scala.math.BigDecimal.RoundingMode.HALF_UP))
          }
        }
        if (terms.isEmpty) None
        else Some(id -> terms.sum.doubleValue)
      }.toMap
    val q1 = bm25(Seq("spark", "data"))
    got.collect { case ((100L, _, nId), score) =>
      assert(score == q1(nId), s"doc $nId")
    }
    // "cats" appears only in doc 4
    val ranked200 = got.keys.filter(_._1 == 200L).toSeq
    assert(ranked200 == Seq((200L, 1L, 4L)))
    // higher tf wins among single-term matches: doc 5 (3x spark) outranks
    // doc 2 (1x spark, no data)
    val rankOf = got.keys.collect { case (100L, r, nid) => nid -> r }.toMap
    assert(rankOf(5L) < rankOf(2L))
  }

  test("empty corpus returns an empty frame, not a MatchError") {
    val queries = docs(100L -> "spark data")
    val out = Retrieval.bm25TopK(docs(), "doc_id", "text",
      queries, "doc_id", "text", k = 5)
    assert(out.columns.toSeq == Seq("q_id", "rank", "doc_id", "score"))
    assert(out.count() == 0L)
  }

  test("scores are partition-invariant") {
    val big = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val queries = big.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id"),
        array_join(slice(TextAnalysis.tokens(col("text")), 1, 5), " ").as("q"))
    def run(parts: Int) = Retrieval.bm25TopK(big.repartition(parts), "doc_id",
        "text", queries, "doc_id", "q", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val a = run(1)
    assert(a == run(7) && a.nonEmpty)
  }

  test("scoring joins broadcast the query side; no sort-merge join") {
    val big = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val queries = big.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id"), col("text").as("q"))
    val plan = Retrieval.bm25TopK(big, "doc_id", "text",
        queries, "doc_id", "q", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  // ---- tfidfSimilarPairs ---------------------------------------------------

  test("tfidf pairs match a driver-side integer-quantized recomputation") {
    val c = docs(corpus: _*)
    val got = Retrieval.tfidfSimilarPairs(c, "doc_id",
        TextAnalysis.tokens(col("text")), maxDf = 3, minSim = 0.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    // independent reference: plain Scala maps, same quantization
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val n = corpus.size
    val tf = toks.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (k, v) => k -> v.size.toLong } }.toMap
    val dfm = toks.flatMap(_._2.distinct).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val keep = dfm.filter { case (_, d) => d <= 3 && d < n }
      .map { case (t, d) => t -> math.round(math.log(n.toDouble / d) * 1e6) }
    val w = tf.map { case (id, m) =>
      id -> m.collect { case (t, f) if keep.contains(t) => t -> f * keep(t) } }
    val ssq = w.map { case (id, m) => id -> m.values.map(x => x * x).sum }
    for {
      (a, wa) <- w; (b, wb) <- w if a < b
      common = wa.keySet.intersect(wb.keySet) if common.nonEmpty
    } {
      val dot = common.toSeq.map(t => wa(t) * wb(t)).sum
      val exp = dot.toDouble / math.sqrt(ssq(a).toDouble * ssq(b).toDouble)
      val (nc, cos) = got((a, b))
      assert(nc == common.size, s"pair ($a,$b) n_common")
      assert(cos == exp, s"pair ($a,$b): $cos vs $exp") // bit-identical, not approx
    }
    // no pair with zero common non-stop terms may appear
    assert(got.keySet.forall { case (a, b) =>
      w(a).keySet.intersect(w(b).keySet).nonEmpty })
  }

  test("tfidf prune: terms above maxDf never contribute") {
    // 'shared' is in all 4 docs (df=4 > maxDf=2) — without the prune every
    // pair would match; with it only the planted near-pair survives
    val c = docs(
      1L -> "shared alpha beta gamma",
      2L -> "shared alpha beta delta",
      3L -> "shared epsilon zeta eta",
      4L -> "shared theta iota kappa")
    val pairs = Retrieval.tfidfSimilarPairs(c, "doc_id",
        TextAnalysis.tokens(col("text")), maxDf = 2, minSim = 0.1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("tfidf identical docs have cosine exactly 1.0") {
    val c = docs(
      1L -> "alpha beta gamma delta",
      2L -> "alpha beta gamma delta",
      3L -> "something entirely different here")
    val r = Retrieval.tfidfSimilarPairs(c, "doc_id",
        TextAnalysis.tokens(col("text")), maxDf = 10, minSim = 0.5)
      .collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 1L && r.head.getLong(1) == 2L)
    assert(r.head.getDouble(3) == 1.0)
  }

  test("tfidf overflow guard raises in-plan on absurd weights") {
    // one doc repeating a rare term enough that tf*idfQ exceeds 3e9
    val hot = ("rareterm " * 250000).trim
    val c = docs(1L -> hot, 2L -> "rareterm once", 3L -> "filler text")
      .repartition(2)
    val ex = intercept[Exception] {
      Retrieval.tfidfSimilarPairs(c, "doc_id",
        TextAnalysis.tokens(col("text")), maxDf = 2, minSim = 0.0).collect()
    }
    assert(ex.getMessage != null)
  }
}

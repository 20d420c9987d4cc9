package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked text retrieval over the corpus — BM25 (Robertson/Lucene
  * variant), built as the classic inverted-index join:
  *
  *  - postings (doc, term, tf, dl) — ONE explode + one grouped count;
  *    the shuffled rows are per-doc distinct terms, and doc length rides
  *    in the grouping key so no second corpus join is needed;
  *  - query terms broadcast onto the postings FIRST, so document
  *    frequencies, scoring and ranking all run over the posting lists of
  *    the query vocabulary only — the corpus never shuffles again;
  *  - corpus constants (N, avgdl) are one scalar aggregate.
  *
  * Per-term scores are IEEE doubles with a fixed parenthesization the
  * SQL oracle writes out identically; the per-document sum accumulates
  * in DECIMAL(28,14) (exact, order-invariant) with one final double
  * cast, so results are partition-invariant and oracle-replicable. ln()
  * may differ by 1 ulp between libm builds — gates render scores at 9 dp,
  * like the ANN gates.
  */
object Retrieval {

  /** Top-k BM25 matches per query: (q_id, rank, doc_id, score).
    * `k1` tempers term-frequency saturation, `b` the length
    * normalization (standard defaults). Query terms are deduplicated;
    * terms absent from the corpus contribute nothing. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("t"))
    val aggRow = toks
      .agg(sum(size(col("t")).cast("long")), count(lit(1))).head
    val n = aggRow.getLong(1)
    if (n == 0L) {
      // empty corpus: sum is null (MatchError) and avgdl divides by zero —
      // return an empty frame with the exact output schema instead
      val scored0 = df.limit(0).select(col(idCol).as("doc_id"))
        .crossJoin(queries.limit(0).select(col(queryIdCol).as("q_id")))
        .select(col("q_id"), col("doc_id"), lit(0.0).as("score"))
      return Similarity.topKPerGroup(scored0, "q_id", "doc_id", "score", k)
    }
    val sumDl = aggRow.getLong(0)
    val avgdl = sumDl.toDouble / n
    val qt = queries.select(col(queryIdCol).as("q_id"),
      explode(array_distinct(TextAnalysis.tokens(col(queryTextCol)))).as("term"))
    // the broadcast vocabulary filter sits BELOW the postings aggregation:
    // only query-term instances reach the (doc, term) groupBy, so the
    // shuffle is the query vocabulary's postings, never the whole corpus's
    val restricted = toks
      .select(col("doc_id"), size(col("t")).as("dl"), explode(col("t")).as("term"))
      .join(broadcast(qt.select("term").distinct()), Seq("term"))
      .groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf"))
    // document frequency per query term — identical to the full-corpus df
    // because restriction only drops OTHER terms' postings
    val dfc = restricted.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val dfD = col("dfreq").cast("double")
    val idf = log(((lit(n.toDouble) - dfD) + 0.5) / (dfD + 0.5) + 1.0)
    val tfD = col("tf").cast("double")
    val num = tfD * (k1 + 1.0)
    val den = tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl))
    val scored = restricted
      .join(broadcast(dfc), Seq("term"))
      .join(broadcast(qt), Seq("term"))
      .groupBy("q_id", "doc_id")
      .agg(sum((idf * (num / den)).cast("decimal(28,14)"))
        .cast("double").as("score"))
    Similarity.topKPerGroup(scored, "q_id", "doc_id", "score", k)
  }
}

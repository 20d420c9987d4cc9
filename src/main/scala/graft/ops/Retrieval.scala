package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    // spread the tokenize+explode off a one-row-group scan (§2.5); the
    // corpus-stats action and the postings build both re-tokenize
    val toks = Pipeline.cpuRebalance(df, col(idCol))
      .select(col(idCol).as("doc_id"),
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
    // materialized once: both the document-frequency aggregation and the
    // scoring join consume it (query-vocab postings — small by the
    // broadcast restriction below)
    val restricted = Dedup.materializeBase(toks
      .select(col("doc_id"), size(col("t")).as("dl"), explode(col("t")).as("term"))
      .join(broadcast(qt.select("term").distinct()), Seq("term"))
      .groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf")), None)
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

  /** All-pairs sparse TF-IDF cosine similarity over the corpus (the
    * posting-list self-join of Lin's "Brute Force and Indexed Approaches
    * to Pairwise Document Similarity" / Twitter DISCO): pairs of documents
    * whose tf·idf vectors — restricted to NON-STOP terms — have cosine
    * ≥ `minSim`, with the common-term count.
    *
    * Scale shape: documents never pair directly. Each doc explodes to its
    * distinct (term, tf) postings (one grouped-count shuffle); terms with
    * document frequency > `maxDf` are dropped BEFORE pairing — the
    * df-prune that makes the self-join linear-ish (a term pairs df²/2
    * docs, so capping df caps the expansion exactly like the LSH bucket
    * cap), and simultaneously the classic stop-term removal (df > maxDf
    * terms carry ~no discriminative weight). The self-join then runs on
    * skinny (term, id, w) rows, and each pair's products fold in one
    * grouped sum.
    *
    * Engine-exact arithmetic: idf quantizes to an integer once
    * (`round(ln(N/df)·10⁶)` — the house ln-ulp discipline; everything
    * after is BIGINT-exact and order-invariant), weights/dots/norms stay
    * integers, and the one final `dot / sqrt(ssqa·ssqb)` is two
    * correctly-rounded IEEE ops from exact integers — bit-identical in
    * any engine. Terms with df = N (idf 0) contribute nothing and are
    * dropped with the stop terms. Norms are over the SAME pruned term
    * space, so the metric is self-consistent. Integer overflow headroom:
    * w ≤ tf·ln(N)·10⁶ — at tf 10³, N 10¹², w ~ 2.8e10, w² ~ 7.6e20
    * overflows — so per-term weights are asserted < 3e9 in-plan
    * (raise_error), the documented contract (shorten docs or raise maxDf
    * quantization before hitting it).
    *
    * `terms` is the per-document term array (whitespace tokens, n-gram
    * shingles, subword pieces — the caller's vector space). */
  def tfidfSimilarPairs(df: DataFrame, idCol: String,
      terms: org.apache.spark.sql.Column,
      maxDf: Long = 100, minSim: Double = 0.2): DataFrame = {
    val n = df.count()
    // posting-list build: rebalance the scan ahead of the gram explode
    // (guide §2.5 — one row-group input pins it to one task), and
    // MATERIALIZE the aggregated postings — the frame feeds the df
    // count, the weighting join, both self-join sides and the norms,
    // and exchange reuse does not cover all of them (round-15 stage
    // audit: the explode subtree executed twice at 12–13 s per run)
    val toks = Dedup.materializeBase(
      Pipeline.cpuRebalance(df, col(idCol))
        .select(col(idCol).as("id"), explode(terms).as("term"))
        .groupBy("id", "term").agg(count(lit(1)).as("tf")), None)
    val dfc = toks.groupBy("term").agg(count(lit(1)).as("dfreq"))
      .filter(col("dfreq") <= maxDf && col("dfreq") < n)
    val idfQ = round(log(lit(n.toDouble) / col("dfreq").cast("double")) * 1e6, 0)
      .cast("long")
    val weighted = toks.join(dfc.hint("SHUFFLE_HASH"), Seq("term"))
      .select(col("id"), col("term"),
        (col("tf") * idfQ).as("w"))
      .withColumn("w",
        when(col("w") < 3000000000L, col("w"))
          .otherwise(raise_error(concat(lit(
            "tfidfSimilarPairs: per-term weight exceeds the 3e9 integer-" +
            "overflow headroom (tf*idfQ="), col("w").cast("string")))))
    val norms = weighted.groupBy("id")
      .agg(sum(col("w") * col("w")).as("ssq"))
    val a = weighted.select(col("term"), col("id").as("id_a"), col("w").as("w_a"))
    val b = weighted.select(col("term"), col("id").as("id_b"), col("w").as("w_b"))
    val dots = a.join(b.hint("SHUFFLE_HASH"), Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("w_a") * col("w_b")).as("dot"),
        count(lit(1)).as("n_common"))
    dots
      .join(norms.select(col("id").as("id_a"), col("ssq").as("ssq_a")), Seq("id_a"))
      .join(norms.select(col("id").as("id_b"), col("ssq").as("ssq_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_common"),
        (col("dot").cast("double")
          / sqrt(col("ssq_a").cast("double") * col("ssq_b").cast("double")))
          .as("cosine"))
      .filter(col("cosine") >= minSim)
  }

  /** Per-document top-k KEYWORDS by tf·idf — the extractive tagging /
    * indexing primitive (search facets, topic labels, weak supervision).
    *
    * Same integer discipline as [[tfidfSimilarPairs]]: idf is quantized
    * ONCE to `round(ln(N/df)·1e6)` (the ln-ulp discipline) so the weight
    * `tf · idfQ` is BIGINT-exact and ranking is engine-exact with ties to
    * the lexicographically-smaller term. Terms above `maxDf` (stop terms)
    * and corpus-universal terms carry no signal and are pruned BEFORE the
    * join, so the weighting join only shuffles the informative postings.
    * The per-doc rank window partitions on the document id — millions of
    * small groups, never a global sort. */
  def tfidfKeywords(df: DataFrame, idCol: String,
      terms: org.apache.spark.sql.Column,
      k: Int = 3, maxDf: Long = 100): DataFrame = {
    require(k >= 1, s"tfidfKeywords: k must be >= 1, got $k")
    val n = df.count()
    // same posting-list discipline as tfidfSimilarPairs: rebalanced
    // explode, materialized once (df-count branch + weighting join)
    val toks = Dedup.materializeBase(
      Pipeline.cpuRebalance(df, col(idCol))
        .select(col(idCol).as("id"), explode(terms).as("term"))
        .groupBy("id", "term").agg(count(lit(1)).as("tf")), None)
    val dfc = toks.groupBy("term").agg(count(lit(1)).as("dfreq"))
      .filter(col("dfreq") <= maxDf && col("dfreq") < n)
    val idfQ = round(log(lit(n.toDouble) / col("dfreq").cast("double")) * 1e6, 0)
      .cast("long")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("w").desc, col("term").asc)
    toks.join(dfc.hint("SHUFFLE_HASH"), Seq("term"))
      .select(col("id"), col("term"), (col("tf") * idfQ).as("w"))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("w"))
  }

  /** Class-based TF-IDF (c-TF-IDF, the BERTopic topic-labeling
    * standard) — "which terms CHARACTERIZE this class/cluster/source?":
    * all documents of a class collapse into one pseudo-document, and
    * term t in class c scores tf_{t,c} · ln(1 + A/f_t), where f_t is
    * the corpus-wide term count and A the average per-class token mass
    * — the class-level analogue of [[tfidfKeywords]]' per-doc ranking
    * (per-doc IDF washes out when every doc in a cluster shares the
    * cluster's vocabulary). Top-`k` terms per class, ties to the
    * lexicographically smaller term.
    *
    * Exactness: tf/f are exact BIGINTs, A/f_t and the ln ride one
    * fixed-parenthesization double chain, scores render at 6 dp (the
    * tokenPmi libm discipline) and the RANK orders by the ROUNDED
    * score — a last-ulp ln divergence cannot reorder the cut (ties
    * break on the term).
    *
    * Shape: one (class, term) count shuffle; corpus frequencies and
    * the two scalar totals reduce the class-term frame (broadcast
    * 1-row totals); the rank window runs over the class-term summary
    * frame — raw tokens are never windowed. */
  def ctfidfTerms(df: DataFrame, classCol: String,
      terms: org.apache.spark.sql.Column, k: Int = 10): DataFrame = {
    require(k >= 1, s"ctfidfTerms: k must be >= 1, got $k")
    val tfc = df.select(col(classCol).as("cls"), explode(terms).as("term"))
      .groupBy("cls", "term").agg(count(lit(1)).as("tf"))
    val ft = tfc.groupBy("term").agg(sum(col("tf")).cast("long").as("f"))
    val totals = tfc.agg(sum(col("tf")).cast("long").as("__T"),
      count_distinct(col("cls")).as("__C"))
    val score = round(col("tf").cast("double") *
      log(lit(1.0) + (col("__T").cast("double") / col("__C").cast("double")) /
        col("f").cast("double")), 6)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("cls").orderBy(col("score").desc, col("term").asc)
    tfc.join(ft.hint("SHUFFLE_HASH"), Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("cls"), col("rank"), col("term"), col("tf"), col("f"),
        col("score"))
  }

  /** Document-level token co-occurrence with pointwise mutual
    * information — collocation mining ("new york"), taxonomy seeds,
    * embedding-free relatedness: for term pair (a, b),
    * `pmi = ln(N · c_ab / (df_a · df_b))` over document frequencies.
    *
    * Scale shape: the same posting-list self-join as
    * [[tfidfSimilarPairs]] with the identical df ≤ maxDf stop-term cap
    * (a term expands at most df² pairs), pair counts by ONE grouped sum,
    * `minPairCount` pruning the long co-occurrence tail before the
    * (broadcast-sized) df join-back. All PMI operands are exact BIGINTs;
    * the ratio is one IEEE division and one `ln`, rendered at 6 dp (the
    * t_entropy discipline — a 9-dp render can flip on a 1-ulp libm
    * difference). */
  def tokenPmi(df: DataFrame, idCol: String,
      terms: org.apache.spark.sql.Column,
      maxDf: Long = 100, minPairCount: Long = 2,
      maxTermsPerDoc: Long = 1000): DataFrame = {
    val n = df.count()
    val postings = df.select(col(idCol).as("id"), explode(terms).as("term"))
      .distinct()
    val dfc = postings.groupBy("term").agg(count(lit(1)).as("dfreq"))
      .filter(col("dfreq") <= maxDf)
    // the pair join is per-doc quadratic in KEPT terms — bound it
    // in-plan (the ngramJaccard maxBlockSize discipline); the guard
    // rides the id column the join reads, so pruning can't drop it
    val kept0 = Dedup.materializeBase(
      postings.join(dfc.hint("SHUFFLE_HASH"), Seq("term")), None)
    val kept = kept0
      .join(kept0.groupBy("id").agg(count(lit(1)).as("__npd")), Seq("id"))
      .withColumn("id",
        when(col("__npd") <= maxTermsPerDoc, col("id"))
          .otherwise(raise_error(concat(
            lit(s"tokenPmi: document with more than $maxTermsPerDoc kept " +
              "terms (raise maxTermsPerDoc or tighten maxDf); id="),
            col("id").cast("string")))))
    val a = kept.select(col("id"), col("term").as("term_a"),
      col("dfreq").as("df_a"))
    val b = kept.select(col("id"), col("term").as("term_b"),
      col("dfreq").as("df_b"))
    a.join(b.hint("SHUFFLE_HASH"), Seq("id"))
      .filter(col("term_a") < col("term_b"))
      .groupBy("term_a", "term_b")
      .agg(count(lit(1)).as("c_ab"), first(col("df_a")).as("df_a"),
        first(col("df_b")).as("df_b"))
      .filter(col("c_ab") >= minPairCount)
      .select(col("term_a"), col("term_b"), col("c_ab"),
        round(log((lit(n) * col("c_ab")).cast("double") /
          (col("df_a") * col("df_b")).cast("double")), 6).as("pmi"))
  }

  /** Feature-HASHING TF-IDF document vectors (the hashing trick /
    * HashingTF): each term folds into a fixed `dims`-sized feature space
    * via the md5-affine hash, collisions summing — the featurizer whose
    * memory is a design constant instead of a vocabulary table, which is
    * what makes it usable on an unbounded term space at corpus scale.
    * Output is SPARSE (id, dim, weight) rows — densifying 100 TB of
    * mostly-zero lanes is the caller's mistake to make, not this
    * operator's default. Weights are the [[tfidfKeywords]] BIGINT
    * discipline (tf · idf quantized once), so vectors are engine-exact.
    * One explode + two grouped sums + one posting join; no driver state
    * beyond the corpus count. */
  def hashedTfidf(df: DataFrame, idCol: String,
      terms: org.apache.spark.sql.Column,
      dims: Int = 64, maxDf: Long = 100): DataFrame = {
    require(dims >= 1, s"hashedTfidf: dims must be >= 1, got $dims")
    val n = df.count()
    // same posting-list discipline as tfidfSimilarPairs
    val toks = Dedup.materializeBase(
      Pipeline.cpuRebalance(df, col(idCol))
        .select(col(idCol).as("id"), explode(terms).as("term"))
        .groupBy("id", "term").agg(count(lit(1)).as("tf")), None)
    val dfc = toks.groupBy("term").agg(count(lit(1)).as("dfreq"))
      .filter(col("dfreq") <= maxDf && col("dfreq") < n)
    val idfQ = round(log(lit(n.toDouble) / col("dfreq").cast("double")) * 1e6, 0)
      .cast("long")
    toks.join(dfc.hint("SHUFFLE_HASH"), Seq("term"))
      .select(col("id"),
        (Pipeline.md5Long60(col("term"), "feat") % dims).cast("int").as("dim"),
        (col("tf") * idfQ).as("w"))
      .groupBy("id", "dim").agg(sum(col("w")).as("weight"))
  }

  /** Conjunctive (AND) term search with optional exact-phrase predicate —
    * the boolean-retrieval primitive (SURVEY.md §2.11 L98): documents
    * containing EVERY query term, optionally also a phrase as a
    * contiguous token sequence, with the total query-term occurrence
    * count as a rankable hit score.
    *
    * Scan form, not index form, on purpose: for a handful of literal
    * terms the whole predicate compiles into ONE whole-stage-codegen
    * narrow projection (per-term `array_contains` over the token array —
    * no explode, no posting-list shuffle, no join), so the filter
    * composes with any pipeline stage, pushes work to the scan, and is
    * streaming-safe. The posting-list route (build [[bm25TopK]]-style
    * postings, intersect) only wins when the query set amortizes an
    * index build — that path exists as BM25; this is the ad-hoc filter.
    *
    * Phrase matching: token-joined text ' t1 t2 ' searched for
    * ' phrase ' via instr — space-delimited, so matches are exactly the
    * contiguous token subsequences (no substring false hits). */
  def conjunctiveSearch(df: DataFrame, idCol: String, textCol: String,
      allTerms: Seq[String], phrase: Option[String] = None): DataFrame = {
    require(allTerms.nonEmpty, "conjunctiveSearch: need at least one term")
    val terms = allTerms.map(_.toLowerCase(java.util.Locale.ROOT))
    val t = col("__t")
    val hasAll = terms.map(q => array_contains(t, q)).reduce(_ && _)
    val phraseOk = phrase match {
      case None => lit(true)
      case Some(p) =>
        val norm = p.toLowerCase(java.util.Locale.ROOT).trim
          .split("\\s+").mkString(" ")
        instr(concat(lit(" "), array_join(t, " "), lit(" ")),
          s" $norm ") > 0
    }
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .filter(hasAll && phraseOk)
      .select(col(idCol), size(t).as("n_tokens"),
        size(filter(t, x =>
          terms.map(q => x === q).reduce(_ || _))).as("hits"))
  }

  /** Reciprocal-rank fusion (Cormack et al. SIGIR 2009) — the standard
    * hybrid-search combiner: two per-query rankings (lexical BM25 +
    * semantic ANN is the canonical pair — [[bm25TopK]] and
    * `Similarity`'s top-k emit exactly this (q_id, doc_id, rank) shape)
    * merge by score(d) = Σ_sides 1/(k + rank_side(d)), absent side
    * contributes 0, re-ranked per query. Rank-based, so the two sides'
    * incomparable score scales never matter — why RRF beats score
    * interpolation without per-collection tuning.
    *
    * Engine-exact: each contribution is ONE IEEE division of exact
    * integers, the fused score a fixed-order two-term sum, 9-dp render;
    * ties re-rank to the smaller doc id. One (q_id, doc_id) full-outer
    * equi-shuffle + a per-query window over candidate summaries (≤ the
    * two input ks per query — bounded, never corpus-sized). */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 60,
      topK: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    def side(df: DataFrame, out: String) =
      df.select(col("q_id"), col("doc_id"),
        (lit(1.0) / (lit(k.toDouble) + col("rank").cast("double"))).as(out))
    // SHUFFLE_HASH: rank-bounded sides need no sort phase (full-outer
    // shuffled-hash join is supported since Spark 3.1)
    val fused = side(a, "__ca")
      .join(side(b, "__cb").hint("SHUFFLE_HASH"),
        Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        (coalesce(col("__ca"), lit(0.0)) + coalesce(col("__cb"), lit(0.0)))
          .as("__s"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("__s").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), round(col("__s"), 9).as("rrf_score"))
  }

  /** Rank-Biased Overlap (Webber 2010) between two top-k rankings per
    * query — the top-weighted ranking-similarity metric search eval runs
    * when comparing two retrieval systems ([[rrfFuse]] fuses them; this
    * MEASURES how much they agree, weighting depth-1 agreement far above
    * depth-k): RBO@k = (1−p) · Σ_{d=1..k} p^(d−1) · |A_d ∩ B_d| / d.
    *
    * A doc in both lists enters every prefix intersection at depth
    * max(rank_a, rank_b), so |A_d ∩ B_d| is ONE cumulative count over a
    * per-query depth grid (bounded by k — the windows never touch the
    * rankings' source data). The p^(d−1) weights are COMPILED 9-dp
    * constants shared textually with the oracle (the Benford-constants
    * discipline — engine pow() ulp differences never enter); each term
    * rounds to 10 dp and quantizes to DECIMAL(28,14) so the per-query
    * sum is order-invariant; RBO renders at 6 dp.
    *
    * Output per query: `overlap_at_k` (|A_k ∩ B_k|) and `rbo`. Queries
    * present in either ranking emit (disjoint lists give 0.0). */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, queryCol: String,
      idCol: String, rankCol: String, k: Int,
      p: Double = 0.9): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(p > 0.0 && p < 1.0, s"p must be in (0, 1), got $p")
    val wts = rboWeights(p, k)
    val af = a.select(col(queryCol).as("q"), col(idCol).as("__i"),
      col(rankCol).cast("long").as("__ra")).filter(col("__ra") <= k)
    val bf = b.select(col(queryCol).as("q"), col(idCol).as("__i"),
      col(rankCol).cast("long").as("__rb")).filter(col("__rb") <= k)
    val entries = af.join(bf, Seq("q", "__i"))
      .select(col("q"), greatest(col("__ra"), col("__rb")).as("d"))
      .groupBy("q", "d").agg(count(lit(1)).as("__c"))
    val grid = af.select(col("q")).unionByName(bf.select(col("q")))
      .distinct()
      .select(col("q"), explode(sequence(lit(1L), lit(k.toLong))).as("d"))
    val weight = wts.zipWithIndex.foldRight(lit(0.0)) {
      case ((w, i), acc) => when(col("d") === (i + 1), lit(w)).otherwise(acc)
    }
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q")).orderBy(col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    grid.join(entries, Seq("q", "d"), "left")
      .withColumn("__x", sum(coalesce(col("__c"), lit(0L))).over(wq))
      .withColumn("__t", round(weight * col("__x").cast("double") /
        col("d"), 10).cast("decimal(28,14)"))
      .groupBy("q")
      .agg(max(col("__x")).as("overlap_at_k"),
        round(sum(col("__t")).cast("double") * lit(1.0 - p), 6).as("rbo"))
  }

  /** round(p^(d−1), 9) for d = 1..k — compiled constants shared by the
    * operator and (textually) its oracle. */
  def rboWeights(p: Double, k: Int): Seq[Double] =
    (1 to k).map(d => math.rint(math.pow(p, d - 1) * 1e9) / 1e9)

  /** round(1/log₂(r+1), 9) for r = 1..k — the DCG rank discounts as
    * compiled constants shared by [[searchEval]] and (textually) its
    * oracle, so neither engine's log() ulps enter the metric. */
  def dcgDiscounts(k: Int): Seq[Double] =
    (1 to k).map(r =>
      math.rint(1e9 / (math.log(r + 1.0) / math.log(2.0))) / 1e9)

  /** Offline retrieval-quality evaluation — per system: mean nDCG@k,
    * MRR@k and recall@k against graded judgments (the TREC-style
    * scorecard that decides which ranker ships; [[rrfFuse]] COMBINES
    * systems and [[rankBiasedOverlap]] measures their agreement — this
    * measures each against ground truth):
    *
    *   DCG@k  = Σ_{rank r ≤ k} (2^rel − 1) · w_r,  w_r = 1/log₂(r+1)
    *   nDCG@k = DCG@k / IDCG@k (IDCG from the judgments sorted rel
    *            desc, doc asc — deterministic ties)
    *   MRR@k  = 1/first-relevant-rank (0 when no relevant doc in top-k)
    *   recall@k = relevant-retrieved@k / total-relevant
    *
    * `runs` carries (system, query, doc, rank); `qrels` carries
    * (query, doc, graded rel ≥ 0). Only queries with ≥1 positive
    * judgment are evaluated (metrics are undefined otherwise — the
    * trec_eval convention); a system with NO rows for such a query
    * scores 0 on it rather than dropping it (a ranker is not excused
    * from a query by ignoring it).
    *
    * Exactness: the w_r discounts are compiled 9-dp constants (the
    * [[rboWeights]] discipline), gains 2^rel − 1 are exact integer
    * shifts, per-doc terms quantize to DECIMAL(28,14) before every
    * order-invariant sum, and nDCG/MRR/recall are single IEEE
    * divisions; means render at 6 dp.
    *
    * Shape: one (query, doc) equi-join of rank-bounded runs onto the
    * judgments, one (system, query) shuffle of k-bounded rows, one
    * system-sized final aggregate. The ideal-DCG window partitions on
    * the query over the JUDGMENTS frame only — the corpus never sorts.
    * The distinct-systems frame is broadcast onto the per-query stats
    * (every side k- or judgment-bounded; nothing scales with the
    * corpus). */
  def searchEval(runs: DataFrame, qrels: DataFrame, systemCol: String,
      queryCol: String, docCol: String, rankCol: String, relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val disc = dcgDiscounts(k)
    def discAt(r: Column): Column =
      disc.zipWithIndex.foldRight(lit(0.0)) { case ((w, i), acc) =>
        when(r === (i + 1).toLong, lit(w)).otherwise(acc)
      }
    // 2^rel − 1 as compiled exact long constants (rel 0..30 — graded
    // judgments are single digits; the in-plan guard keeps a corrupt
    // rel column from silently wrapping)
    def gain(rel: Column): Column =
      (0 to 30).foldRight(raise_error(concat(
        lit("searchEval: rel grade out of [0, 30]: "), rel))
          .cast("double")) { case (g, acc) =>
        when(rel === g.toLong, lit(((1L << g) - 1L).toDouble))
          .otherwise(acc)
      }
    val qr = qrels
      .select(col(queryCol).as("q"), col(docCol).as("__i"),
        col(relCol).cast("long").as("__rel"))
      .filter(col("__rel").isNotNull && col("__rel") >= 0L)
    val wIdeal = Window.partitionBy(col("q"))
      .orderBy(col("__rel").desc, col("__i"))
    val qstats = qr
      .withColumn("__r", row_number().over(wIdeal).cast("long"))
      .withColumn("__ig", when(col("__r") <= k.toLong && col("__rel") > 0L,
        (gain(col("__rel")) * discAt(col("__r")))
          .cast("decimal(28,14)")))
      .groupBy("q")
      .agg(sum(when(col("__rel") > 0L, 1L).otherwise(0L)).as("__nrel"),
        sum(col("__ig")).as("__idcg"))
      .filter(col("__nrel") > 0L)
    val rn = runs
      .select(col(systemCol).as("system"), col(queryCol).as("q"),
        col(docCol).as("__i"), col(rankCol).cast("long").as("__r"))
      .filter(col("__r").isNotNull && col("__r") >= 1L &&
        col("__r") <= k.toLong)
    val perQ = rn
      .join(qr, Seq("q", "__i"), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
      .groupBy("system", "q")
      .agg(
        sum(when(col("__rel") > 0L,
          (gain(col("__rel")) * discAt(col("__r")))
            .cast("decimal(28,14)"))).as("__dcg"),
        min(when(col("__rel") > 0L, col("__r"))).as("__fr"),
        sum(when(col("__rel") > 0L, 1L).otherwise(0L)).as("__hits"))
    val systems = rn.select(col("system")).distinct()
    val base = broadcast(systems).crossJoin(qstats)
      .join(perQ, Seq("system", "q"), "left")
    val ndcg = coalesce(col("__dcg").cast("double"), lit(0.0)) /
      col("__idcg").cast("double")
    val rr = when(col("__fr").isNotNull,
      lit(1.0) / col("__fr").cast("double")).otherwise(lit(0.0))
    val rec = coalesce(col("__hits"), lit(0L)).cast("double") /
      col("__nrel").cast("double")
    base
      .select(col("system"),
        ndcg.cast("decimal(28,14)").as("__qn"),
        rr.cast("decimal(28,14)").as("__qm"),
        rec.cast("decimal(28,14)").as("__qr"))
      .groupBy("system")
      .agg(count(lit(1)).as("n_queries"),
        round(sum(col("__qn")).cast("double") /
          count(lit(1)).cast("double"), 6).as("ndcg"),
        round(sum(col("__qm")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mrr"),
        round(sum(col("__qr")).cast("double") /
          count(lit(1)).cast("double"), 6).as("recall"))
  }

  /** ZIPF rank-frequency fit per class — the one-number corpus-health
    * readout ("is this source natural language?"): natural text follows
    * freq ∝ rank^(−s) with s ≈ 1; boilerplate/spam/generated corpora
    * bend the log-log line (|slope| drifts, R² drops). Fits OLS of
    * ln(freq) on ln(rank) over the TOP `maxRank` terms (the standard
    * head fit — the hapax tail bends away from the power law by
    * construction).
    *
    * Scale shape: ranking never sorts a class's whole vocabulary on one
    * core — a tf-DOMAIN cumulative window (rows = distinct tf values
    * per class) computes each tf block's exclusive higher-count, only
    * blocks starting under `maxRank` survive the prune, and the
    * row_number runs over that ≤ maxRank(+straddling block) slice.
    * Exactness: ln(rank)/ln(tf) round to 6 dp and quantize to
    * DECIMAL(18,6) (products are exact DECIMAL(38,12) sums), then the
    * [[graft.ops.Stats.linearFit]] fixed-parenthesization
    * slope/intercept/R² chains; 6-dp renders. Classes with a single
    * distinct rank null the fit. */
  def zipfFit(df: DataFrame, classCol: String, toks: Column,
      maxRank: Int = 1000): DataFrame = {
    require(maxRank >= 2, s"maxRank must be >= 2, got $maxRank")
    import org.apache.spark.sql.expressions.Window
    val tf = df
      .select(col(classCol).as("cls"), explode(toks).as("term"))
      .groupBy("cls", "term").agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy("cls").agg(count(lit(1)).as("n_terms"))
    val wDom = Window.partitionBy(col("cls")).orderBy(col("tf").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dom = tf.groupBy("cls", "tf").agg(count(lit(1)).as("__m"))
      .withColumn("__cumHi", sum(col("__m")).over(wDom) - col("__m"))
      .filter(col("__cumHi") < maxRank)
    val wRank = Window.partitionBy(col("cls"))
      .orderBy(col("tf").desc, col("term"))
    val head = tf
      .join(dom.select("cls", "tf"), Seq("cls", "tf"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= maxRank)
    def q6(c: Column) = round(c, 6).cast("decimal(18,6)")
    val m = head.select(col("cls"),
      q6(log(col("rank").cast("double"))).as("x"),
      q6(log(col("tf").cast("double"))).as("y"))
      .groupBy("cls").agg(
        count(lit(1)).as("n_fit"),
        sum(col("x")).cast("decimal(38,6)").as("__sx"),
        sum(col("y")).cast("decimal(38,6)").as("__sy"),
        sum((col("x") * col("x")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("__sxx"),
        sum((col("y") * col("y")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("__syy"),
        sum((col("x") * col("y")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("__sxy"))
    def d(c: Column) = c.cast("double")
    val n = d(col("n_fit"))
    val num = n * d(col("__sxy")) - d(col("__sx")) * d(col("__sy"))
    val denX = n * d(col("__sxx")) - d(col("__sx")) * d(col("__sx"))
    val denY = n * d(col("__syy")) - d(col("__sy")) * d(col("__sy"))
    val slope = num / denX
    vocab.join(m, Seq("cls"))
      .select(col("cls"), col("n_terms"), col("n_fit"),
        when(col("n_fit") >= 2L && denX > 0.0, round(slope, 6))
          .as("slope"),
        when(col("n_fit") >= 2L && denX > 0.0,
          round((d(col("__sy")) - slope * d(col("__sx"))) / n, 6))
          .as("intercept"),
        when(col("n_fit") >= 2L && denX > 0.0 && denY > 0.0,
          round(num * num / (denX * denY), 6)).as("r2"))
  }

  /** Term BURSTINESS — the variance-to-mean ratio of a term's per-doc
    * count over ALL documents (zeros included, which the identity
    * var/mean = Σc²/cf − cf/N makes free — no dense grid): VMR ≈ 1 is
    * Poisson scatter (function words — `the` appears everywhere at its
    * base rate), VMR ≫ 1 is a BURSTY topical term (absent from most
    * docs, dense where it appears). The standard keyword/topicality
    * signal beside [[ctfidfTerms]] (which needs classes; burstiness
    * needs only the corpus), and a stopword detector that needs no
    * stopword list.
    *
    * Exactness: doc_freq/total_freq/Σc² are exact integer sums (c² in
    * DECIMAL(38,0)); VMR and the per-containing-doc mean are single
    * fixed-parenthesization double chains, 6 dp. Shape: one
    * (term, doc) count shuffle → one term aggregation; the corpus size
    * joins in as a broadcast 1-row frame. */
  def termBurstiness(df: DataFrame, idCol: String, toks: Column,
      minDf: Long = 5L): DataFrame = {
    require(minDf >= 1L, s"minDf must be >= 1, got $minDf")
    val perDoc = df
      .select(col(idCol).as("id"), explode(toks).as("term"))
      .groupBy("term", "id").agg(count(lit(1)).as("__c"))
    val nDocs = df.agg(count(lit(1)).as("__n"))
    val agg = perDoc.groupBy("term").agg(
      count(lit(1)).as("doc_freq"),
      sum(col("__c")).as("total_freq"),
      sum((col("__c").cast("decimal(19,0)") *
        col("__c").cast("decimal(19,0)")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("__s2"))
      .filter(col("doc_freq") >= minDf)
    agg.crossJoin(broadcast(nDocs))
      .select(col("term"), col("doc_freq"), col("total_freq"),
        round(col("total_freq").cast("double") /
          col("doc_freq").cast("double"), 6).as("mean_in_docs"),
        round(col("__s2").cast("double") /
          col("total_freq").cast("double") -
          col("total_freq").cast("double") / col("__n").cast("double"),
          6).as("vmr"))
  }

  /** G² log-likelihood KEYNESS (Dunning 1993) of every term between a
    * TARGET corpus slice and the rest — the corpus-linguistics standard
    * for "what words characterize this source/class?" beside
    * [[ctfidfTerms]] (c-TF-IDF ranks within-class salience; G² carries
    * a SIGNIFICANCE magnitude comparable across terms, robust at low
    * counts where PMI-style ratios explode):
    *
    *   G² = 2·( a·ln(a/E₁) + b·ln(b/E₂) ),
    *   E₁ = c·(a+b)/(c+d),  E₂ = d·(a+b)/(c+d)
    *
    * with a/b the term's target/rest counts and c/d the corpora's total
    * token counts. `overused` (target-leaning) decides by the EXACT
    * integer cross-product a·d > b·c — never the float ratios;
    * `log_ratio` (ln of the relative risk, the effect-size companion)
    * is null when either side is absent. Zero-count terms contribute a
    * zero G² term (the 0·ln0 = 0 limit), so single-sided terms still
    * score.
    *
    * Exactness: counts are exact integer sums; E₁/E₂ and each a·ln(a/E)
    * are fixed-parenthesization double chains, the two addends rounded
    * at 10 dp before the one addition (no aggregation over terms — G²
    * is per-row, so no order-invariance machinery needed); 6-dp
    * renders. Shape: ONE map-combinable (term) count shuffle; the
    * corpus totals join back as a broadcast 1-row frame. */
  def keynessG2(df: DataFrame, classCol: String, toks: Column,
      targetClass: String, minCount: Long = 10L): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val counts = df
      .select((col(classCol) === targetClass).as("__tgt"),
        explode(toks).as("term"))
      .groupBy("term").agg(
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("n_target"),
        sum(when(!col("__tgt"), 1L).otherwise(0L)).as("n_rest"))
    val totals = counts.agg(
      sum(col("n_target")).as("__c"), sum(col("n_rest")).as("__d"))
    def d(c: Column) = c.cast("double")
    val a = d(col("n_target"))
    val b = d(col("n_rest"))
    val cT = d(col("__c"))
    val dT = d(col("__d"))
    val e1 = cT * (a + b) / (cT + dT)
    val e2 = dT * (a + b) / (cT + dT)
    val t1 = when(col("n_target") > 0L, round(a * log(a / e1), 10))
      .otherwise(lit(0.0))
    val t2 = when(col("n_rest") > 0L, round(b * log(b / e2), 10))
      .otherwise(lit(0.0))
    counts.crossJoin(broadcast(totals))
      .filter(col("n_target") + col("n_rest") >= minCount)
      .select(col("term"), col("n_target"), col("n_rest"),
        round(lit(2.0) * (t1 + t2), 6).as("g2"),
        (col("n_target").cast("decimal(19,0)") *
          col("__d").cast("decimal(19,0)") >
          col("n_rest").cast("decimal(19,0)") *
            col("__c").cast("decimal(19,0)")).as("overused"),
        when(col("n_target") > 0L && col("n_rest") > 0L,
          round(log((a / cT) / (b / dT)), 6)).as("log_ratio"))
  }
}

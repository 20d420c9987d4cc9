package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Gate queries + DuckDB oracles for the round-9 analytics wave
  * (SURVEY.md §2.11 L93–L101): grouped normalization/outliers, SCD2
  * history, time-series gap fill, decay scoring, lexical
  * diversity/readability, boolean search, and blocked fuzzy linkage.
  */
object AnalyticsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-source z-scores over document lengths, |z| > 2 anomaly flags:
    // DECIMAL-exact moments (one group shuffle), broadcast back onto a
    // zero-shuffle scoring scan; decisions on the 6-dp-rounded z
    "q_anomaly_zscore" -> { (s, d) =>
      graft.ops.Stats.zscoreFlags(Tables.documents(s, d), "doc_id",
          "n_chars", "source", zThresh = 2.0)
        .orderBy("doc_id")
    },
    // per-source percent-rank normalization of document lengths — the
    // distribution-free score calibration; one per-group window
    "q_quantile_normalize" -> { (s, d) =>
      graft.ops.Stats.percentRankNormalize(Tables.documents(s, d),
          "doc_id", "n_chars", "source")
        .orderBy("source", "n_chars", "doc_id")
    },
    // SCD Type-2 history from the event change log: per-user event_type
    // versions with [valid_from, valid_to) event-id spans, consecutive
    // same-value deliveries compacted; everything shuffles once on the key
    "q_scd2_history" -> { (s, d) =>
      graft.ops.Cdc.scd2History(Tables.events(s, d), "user_id",
          "event_id", Seq("event_type"))
        .orderBy("user_id", "valid_from")
    },
    // daily gap-filled per-user value series with forward fill: in-plan
    // grid generate between each user's first/last day, DECIMAL-exact
    // per-bucket sums, last(ignoreNulls) carry-forward
    "q_gap_fill" -> { (s, d) =>
      graft.ops.Behavior.gapFill(Tables.events(s, d), "user_id", "ts",
          "value", stepSeconds = 86400L)
        .orderBy("u", "b")
    },
    // half-life-bucketed exponential decay engagement score as of
    // 2024-02-01, half-life 7 days: integer exponents make 0.5^n exact,
    // terms quantize to DECIMAL(18,6) so the sum is order-invariant
    "q_decay_score" -> { (s, d) =>
      graft.ops.Behavior.decayScore(Tables.events(s, d), "user_id", "ts",
          "value", asOfEpoch = 1706745600L, halfLifeDays = 7L)
        .orderBy("u")
    },
    // per-document type-token ratio + hapax share via the zero-shuffle
    // sorted-run fold — provably equal to the oracle's explode→groupBy
    "t_lexical_diversity" -> { (s, d) =>
      graft.ops.TextAnalysis.lexicalDiversity(Tables.documents(s, d),
          "doc_id", "text")
        .orderBy("doc_id")
    },
    // Flesch-style readability with the regex syllable proxy (vowel-group
    // runs) — one narrow scan, sentence floor at 1
    "t_readability" -> { (s, d) =>
      graft.ops.TextAnalysis.readability(Tables.documents(s, d),
          "doc_id", "text")
        .orderBy("doc_id")
    },
    // conjunctive AND search + exact-phrase predicate as ONE codegen
    // narrow projection (no explode, no posting shuffle)
    "t_boolean_search" -> { (s, d) =>
      graft.ops.Retrieval.conjunctiveSearch(Tables.documents(s, d),
          "doc_id", "text", Seq("query", "table"), Some("the line"))
        .orderBy("doc_id")
    },
    // blocked fuzzy linkage: within-brand part-name pairs at edit
    // distance ≤ 2 — balanced triangle self-join chunks, lossless length
    // prune before the DP, in-plan oversize-block guard
    "q_fuzzy_match" -> { (s, d) =>
      graft.ops.Linkage.fuzzyPairs(Tables.part(s, d), "p_partkey",
          "p_name", "p_brand", maxDist = 2)
        .orderBy("blk", "id_a", "id_b")
    },
    // prefix-filtered set-similarity join: LOSSLESS recall (the oracle is
    // brute force) — rarest-gram prefixes generate candidates, packed-set
    // exact verify; no blocking key, no banding recall loss
    "d_prefix_jaccard" -> { (s, d) =>
      graft.ops.Dedup.prefixFilterJaccardPairs(Tables.documents(s, d),
          "doc_id", "text", n = 3, threshold = 0.6)
        .orderBy("id_a", "id_b")
    },
    // table profiling data card over lineitem: one aggregation job for
    // every column's row/null/exact-distinct counts + min/max renders
    "q_profile_table" -> { (s, d) =>
      graft.ops.Profile.profileTable(Tables.lineitem(s, d))
        .orderBy("column")
    },
    // grouped top-k WITHOUT a per-group sort: O(k)-state map-combinable
    // top-k aggregation (TopKStructAgg) — top-3 orders per customer
    "q_group_topk" -> { (s, d) =>
      graft.ops.Similarity.topKPerGroup(Tables.orders(s, d), "o_custkey",
          "o_orderkey", "o_totalprice", k = 3)
        .orderBy("o_custkey", "rank")
    },
    // time-weighted average per user over irregular event samples:
    // exact microsecond durations, DECIMAL-exact weighted sums
    "q_time_weighted_avg" -> { (s, d) =>
      graft.ops.Behavior.timeWeightedAvg(Tables.events(s, d), "user_id",
          "ts", "value")
        .orderBy("u")
    })

  private val tokensSql =
    "list_filter(string_split(lower(text), ' '), x -> x <> '')"

  def oracles: Map[String, String] = Map(
    "q_anomaly_zscore" ->
      """WITH m AS (SELECT source, count(*) AS n,
        |    CAST(sum(CAST(n_chars AS DECIMAL(14,2))) AS DECIMAL(28,2)) AS s,
        |    CAST(sum(CAST(n_chars AS DECIMAL(14,2)) * CAST(n_chars AS DECIMAL(14,2))) AS DECIMAL(38,4)) AS ss
        |  FROM documents GROUP BY 1),
        |st AS (SELECT source, n, CAST(s AS DOUBLE) / n AS mean,
        |    CASE WHEN n >= 2 THEN (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1) END AS var
        |  FROM m)
        |SELECT doc_id, d.source, CAST(n_chars AS DECIMAL(14,2)) AS v,
        |  round(mean, 6) AS mean,
        |  CASE WHEN var > 0 THEN round((CAST(n_chars AS DOUBLE) - mean) / sqrt(var), 6) END AS z,
        |  coalesce(abs(CASE WHEN var > 0 THEN round((CAST(n_chars AS DOUBLE) - mean) / sqrt(var), 6) END) > 2.0, false) AS is_anomaly
        |FROM documents d JOIN st ON d.source = st.source
        |ORDER BY doc_id""".stripMargin,
    "q_quantile_normalize" ->
      """SELECT doc_id, source, n_chars,
        |  round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars), 9) AS pr
        |FROM documents ORDER BY source, n_chars, doc_id""".stripMargin,
    "q_scd2_history" ->
      """WITH c AS (SELECT user_id, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events),
        |k AS (SELECT user_id, event_id, event_type FROM c
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type, event_id AS valid_from,
        |  lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to,
        |  lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL AS is_current
        |FROM k ORDER BY user_id, valid_from""".stripMargin,
    "q_gap_fill" ->
      """WITH obs AS (SELECT user_id AS u,
        |    CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) * 86400 AS b,
        |    CAST(sum(CAST(value AS DECIMAL(14,2))) AS DECIMAL(24,2)) AS v_obs
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT u, min(b) AS lo, max(b) AS hi FROM obs GROUP BY 1),
        |grid AS (SELECT u, unnest(generate_series(lo, hi, 86400)) AS b FROM span)
        |SELECT g.u, g.b, o.v_obs,
        |  last_value(o.v_obs IGNORE NULLS) OVER (PARTITION BY g.u ORDER BY g.b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
        |  o.v_obs IS NOT NULL AS is_observed
        |FROM grid g LEFT JOIN obs o ON g.u = o.u AND g.b = o.b
        |ORDER BY g.u, g.b""".stripMargin,
    "q_decay_score" ->
      """WITH t AS (SELECT user_id AS u, value,
        |    CAST(floor((1706745600 - floor(epoch(ts))) / (86400.0 * 7)) AS BIGINT) AS p
        |  FROM events)
        |SELECT u,
        |  CAST(sum(CAST(round(CASE WHEN p < 0 OR p > 62 THEN 0.0
        |    ELSE value * power(0.5, CAST(p AS DOUBLE)) END, 6) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS decay_score,
        |  count(*) AS n_events
        |FROM t GROUP BY u ORDER BY u""".stripMargin,
    "t_lexical_diversity" ->
      s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS w FROM documents),
        |cnt AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS types,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
        |  FROM cnt GROUP BY 1)
        |SELECT d.doc_id, coalesce(n, 0) AS n_tokens,
        |  coalesce(types, 0) AS n_types, coalesce(hapax, 0) AS n_hapax,
        |  CASE WHEN n > 0 THEN round(CAST(types AS DOUBLE) / n, 6) END AS ttr,
        |  CASE WHEN types > 0 THEN round(CAST(hapax AS DOUBLE) / types, 6) END AS hapax_ratio
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "t_readability" ->
      s"""WITH f AS (SELECT doc_id,
        |    CAST(len($tokensSql) AS INTEGER) AS n_words,
        |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS INTEGER) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS INTEGER) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 THEN
        |    round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
        |      - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6) END AS flesch
        |FROM f ORDER BY doc_id""".stripMargin,
    "t_boolean_search" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS t FROM documents)
        |SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tokens,
        |  CAST(len(list_filter(t, x -> x = 'query' OR x = 'table')) AS INTEGER) AS hits
        |FROM t
        |WHERE list_has_all(t, ['query', 'table'])
        |  AND instr(' ' || array_to_string(t, ' ') || ' ', ' the line ') > 0
        |ORDER BY doc_id""".stripMargin,
    "q_fuzzy_match" ->
      """WITH p AS (SELECT p_partkey AS id, p_brand AS blk, p_name AS s,
        |    len(p_name) AS l FROM part)
        |SELECT a.blk, a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
        |FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
        |  AND abs(a.l - b.l) <= 2
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY a.blk, id_a, id_b""".stripMargin,
    // the selling point of the prefix filter is losslessness, so the
    // oracle is BRUTE FORCE: every pair sharing >= 1 distinct 3-shingle,
    // exact intersection from the postings join, Jaccard as one division
    // of exact integers (identical doubles in both engines)
    "d_prefix_jaccard" ->
      s"""WITH toksq AS (SELECT doc_id, $tokensSql AS t FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) >= 3
        |      THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
        |      ELSE [array_to_string(t, ' ')] END)) AS g
        |  FROM toksq),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
        |FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
        |  JOIN sizes sb ON inter.id_b = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin,
    "q_profile_table" -> {
      val cols = Seq(
        ("l_orderkey", "bigint", false), ("l_partkey", "bigint", false),
        ("l_suppkey", "bigint", false), ("l_linenumber", "int", false),
        ("l_quantity", "double", true), ("l_extendedprice", "double", true),
        ("l_discount", "double", true), ("l_tax", "double", true),
        ("l_returnflag", "string", false), ("l_linestatus", "string", false),
        ("l_shipdate", "timestamp_ntz", false))
      cols.map { case (c, t, dbl) =>
        val mn = if (dbl) s"CAST(CAST(min($c) AS DECIMAL(28,6)) AS VARCHAR)"
          else s"CAST(min($c) AS VARCHAR)"
        val mx = if (dbl) s"CAST(CAST(max($c) AS DECIMAL(28,6)) AS VARCHAR)"
          else s"CAST(max($c) AS VARCHAR)"
        s"""SELECT '$c' AS "column", '$t' AS dtype, count(*) AS n_rows,
          |  count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct,
          |  $mn AS min_s, $mx AS max_s FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },
    "q_group_topk" ->
      """SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY (-1.0 * o_totalprice) ASC, o_orderkey ASC) AS BIGINT) AS rank
        |  FROM orders)
        |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,
    "q_time_weighted_avg" ->
      """WITH t AS (SELECT user_id AS u, epoch_us(ts) AS us,
        |    CAST(value AS DECIMAL(14,2)) AS v FROM events),
        |d AS (SELECT u, v, coalesce(lead(us) OVER (PARTITION BY u
        |    ORDER BY us, v) - us, 0) AS dur FROM t)
        |SELECT u,
        |  CASE WHEN sum(dur) > 0 THEN
        |    round(CAST(sum(CAST(v * CAST(dur AS DECIMAL(18,0)) AS DECIMAL(38,2))) AS DOUBLE)
        |      / sum(dur), 6) END AS twa,
        |  count(*) AS n_events
        |FROM d GROUP BY u ORDER BY u""".stripMargin)
}

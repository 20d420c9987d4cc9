package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the behavioral-analytics operators
  * (ordered funnel, cohort retention, transition matrix) plus the
  * filtered-ANN pre-filter contract and tf-idf keyword ranking. The
  * DuckDB gates (q_event_funnel, q_cohort_retention,
  * q_event_transitions, s_filtered_ann, t_keywords_tfidf) pin engine
  * parity at sf scale; these pin the SEMANTICS on inputs small enough
  * to verify by hand — strictly-after gating, same-timestamp
  * exclusion, cohort week arithmetic, pre- vs post-filter k.
  */
class BehaviorSpec extends SparkSpec {

  private def events(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "tss", "event_type")
      .withColumn("ts", to_timestamp(col("tss")))
      .withColumn("event_id", monotonically_increasing_id())
  }

  test("funnel: first-touch chain with strictly-after gating") {
    val ev = events(
      (1L, "2024-01-01 00:01:00", "view"),
      (1L, "2024-01-01 00:02:00", "click"),
      (1L, "2024-01-01 00:03:00", "purchase"),
      // u2: first click precedes the first view; the qualifying click is
      // the later one, and the purchase lands BEFORE it → step 2 only
      (2L, "2024-01-01 00:01:00", "click"),
      (2L, "2024-01-01 00:02:00", "view"),
      (2L, "2024-01-01 00:04:00", "purchase"),
      (2L, "2024-01-01 00:05:00", "click"),
      // u3: purchase before any view, no click at all → step 1 only
      (3L, "2024-01-01 00:01:00", "purchase"),
      (3L, "2024-01-01 00:02:00", "view"),
      // u4: click at the SAME instant as the view → strictly-after
      // excludes it → step 1 only
      (4L, "2024-01-01 00:01:00", "view"),
      (4L, "2024-01-01 00:01:00", "click"))
    val out = Behavior.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).orderBy("step").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 0.5, 0.25))
    assert(out(0).isNullAt(4))
    assert(out(1).getDouble(4) == 0.5)
    assert(out(2).getDouble(4) == 0.5)
  }

  test("funnel: partition-invariant") {
    val ev = events(
      (1L, "2024-01-01 00:01:00", "view"),
      (1L, "2024-01-01 00:02:00", "click"),
      (2L, "2024-01-01 00:01:00", "view"))
    val a = Behavior.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click")).orderBy("step").collect().toSeq
    val b = Behavior.funnel(ev.repartition(7), "user_id", "ts", "event_type",
      Seq("view", "click")).orderBy("step").collect().toSeq
    assert(a == b)
  }

  test("cohortRetention: Monday-truncated cohorts and week offsets") {
    // 2024-01-01 is a Monday
    val ev = events(
      (1L, "2024-01-01 10:00:00", "view"), // cohort w0
      (1L, "2024-01-10 10:00:00", "view"), // offset 1
      (2L, "2024-01-02 10:00:00", "view"), // cohort w0 only
      (3L, "2024-01-09 10:00:00", "view"), // cohort w1 (Jan 8)
      (3L, "2024-01-22 10:00:00", "view")) // offset 2 from w1
    val out = Behavior.cohortRetention(ev, "user_id", "ts", maxWeeks = 4)
      .orderBy("cohort_week", "week_offset").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSeq == Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-08", 0, 1L, 1L, 1.0),
      ("2024-01-08", 2, 1L, 1L, 1.0)))
  }

  test("cohortRetention: maxWeeks bounds the offsets") {
    val ev = events(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-03-01 10:00:00", "view")) // offset 8 — dropped at max 4
    val out = Behavior.cohortRetention(ev, "user_id", "ts", maxWeeks = 4)
      .collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0))
  }

  test("eventTransitions: lead pairs and row-normalized probabilities") {
    val ev = events(
      (1L, "2024-01-01 00:01:00", "a"),
      (1L, "2024-01-01 00:02:00", "b"),
      (1L, "2024-01-01 00:03:00", "a"),
      (2L, "2024-01-01 00:01:00", "a"),
      (2L, "2024-01-01 00:02:00", "a"))
    val out = Behavior.eventTransitions(ev, "user_id", "ts", "event_type",
      "event_id").orderBy("from_type", "to_type").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(3))).toSeq == Seq(
      ("a", "a", 1L, 0.5), ("a", "b", 1L, 0.5), ("b", "a", 1L, 1.0)))
  }

  test("filteredIvfTopK: pre-filter keeps k from the ELIGIBLE set") {
    import spark.implicits._
    // one cell; vec 11 is the nearest to the query but ineligible (odd id)
    val rows = Seq(
      (10L, Array(1.0f, 0.0f), 0),
      (11L, Array(0.99f, 0.14f), 0), // nearest, filtered out
      (12L, Array(0.9f, 0.44f), 0),
      (14L, Array(0.5f, 0.87f), 0),
      (99L, Array(1.0f, 0.01f), 0)) // the query itself
    val e = rows.toDF("vec_id", "embedding", "label")
    val q = e.filter(col("vec_id") === 99L)
    val out = Similarity.filteredIvfTopK(e, "vec_id", "embedding", "label",
      pmod(col("vec_id"), lit(2)) === 0, q, "vec_id", "embedding", "label",
      k = 2).orderBy("rank").collect()
    // post-filtering an unfiltered top-2 would have returned only vec 10;
    // pre-filter returns 2 eligible neighbors with 11 absent
    assert(out.map(_.getAs[Long]("n_id")).toSeq == Seq(10L, 12L))
  }

  test("eventTransitions: bucket-stitched == naive single window (differential)") {
    import org.apache.spark.sql.expressions.Window
    // deterministic pseudo-random timeline: 3 users x 40 events spread
    // over 6 days, types from a 4-letter alphabet; 5-minute buckets force
    // MANY boundary stitches
    val rows = for (u <- 1L to 3L; i <- 0 until 40) yield {
      val h = (u * 7919 + i * 104729) % 100000
      (u, f"2024-01-0${1 + (h % 6)}%s ${(h / 7) % 24}%02d:${h % 60}%02d:00",
        "abcd".charAt((h % 4).toInt).toString)
    }
    val ev = events(rows: _*)
    def naive(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      df.withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
    }
    val got = Behavior.eventTransitions(ev, "user_id", "ts", "event_type",
        "event_id", bucketLen = "5 minutes")
      .select("from_type", "to_type", "n")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = naive(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
    // hot-user shape: one user holds ~all events — result unchanged
    val hot = events((1 to 60).map(i =>
      (9L, f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00",
        "xy".charAt(i % 2).toString)): _*)
    val g2 = Behavior.eventTransitions(hot, "user_id", "ts", "event_type",
        "event_id", bucketLen = "10 minutes")
      .select("from_type", "to_type", "n")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val w2 = naive(hot)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(g2 == w2)
  }

  test("abTestStats: Welch t from hand-computed moments") {
    import spark.implicits._
    val ev = Seq((1L, 2.0), (1L, 4.0), (2L, 1.0), (3L, 2.0), (4L, 3.0))
      .toDF("user_id", "value")
    val r = Behavior.abTestStats(ev, "user_id", "value").collect().head
    // variant 1 = users {1, 3}: m = 6, 2 -> n=2 s=8 ss=40, var=8
    // variant 0 = users {2, 4}: m = 1, 3 -> n=2 s=4 ss=10, var=2
    // t = (4 - 2) / sqrt(8/2/2 + 2/2/2) -> 2/sqrt(5)
    assert((r.getLong(0), r.getLong(1)) == (2L, 2L))
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 4.0)
    assert(r.getDouble(4) == BigDecimal(2.0 / math.sqrt(5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("knnGraph: same-cell top-k, self excluded, mega-cell guard") {
    import spark.implicits._
    val e = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.44f), 0),
      (3L, Array(0.0f, 1.0f), 0), (4L, Array(1.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnGraph(e, "vec_id", "embedding", "label", k = 1)
      .collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("n_id")).toMap
    // cell 0: 1<->2 nearest each other; 3's nearest is 2; 4 alone -> no rows
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    val ex = intercept[Exception] {
      Similarity.knnGraph(e, "vec_id", "embedding", "label", k = 1,
        maxCellSize = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("re-cluster")))
  }

  test("hashedTfidf: mass-preserving fold into bounded lanes") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb aa cc"), (2L, "bb dd"), (3L, "ee ff"))
      .toDF("doc_id", "text")
    val hashed = Retrieval.hashedTfidf(docs, "doc_id",
      split(col("text"), " "), dims = 4, maxDf = 10)
    val lanes = hashed.select("dim").distinct().collect().map(_.getInt(0))
    assert(lanes.forall(d => d >= 0 && d < 4))
    // collision folding preserves total weight per doc: compare against
    // the unhashed per-term weights from the keywords path (k large)
    val flat = Retrieval.tfidfKeywords(docs, "doc_id",
      split(col("text"), " "), k = 100, maxDf = 10)
    val hSums = hashed.groupBy("id").agg(sum("weight").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fSums = flat.groupBy("id").agg(sum("w").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hSums == fSums)
  }

  test("tfidfKeywords: integer tf·idf ranking with term-asc ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry date")).toDF("doc_id", "text")
    val out = Retrieval.tfidfKeywords(docs, "doc_id",
      split(col("text"), " "), k = 2, maxDf = 10)
      .orderBy(col("id"), col("rank")).collect()
    val idf1 = math.round(math.log(3.0 / 1.0) * 1e6) // df=1 → 1098612
    val idf2 = math.round(math.log(3.0 / 2.0) * 1e6) // df=2 → 405465
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getString(2),
      r.getLong(3))).toSeq == Seq(
      (1L, 1, "apple", 2 * idf1), (1L, 2, "banana", idf2),
      // doc 2: banana and cherry tie at idf2 → term asc
      (2L, 1, "banana", idf2), (2L, 2, "cherry", idf2),
      (3L, 1, "date", idf1), (3L, 2, "cherry", idf2)))
  }

  // ---- round-15 NULL-key convention sweep (the sessionize lesson) ------

  private def nullableEvents(rows: (java.lang.Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "tss", "event_type")
      .withColumn("ts", to_timestamp(col("tss")))
      .withColumn("event_id", monotonically_increasing_id())
  }

  test("funnel + funnelLatency: NULL user is one ordinary group that advances steps") {
    val ev = nullableEvents(
      (null, "2024-01-01 00:01:00", "view"),
      (null, "2024-01-01 00:02:00", "click"),
      (1L, "2024-01-01 00:01:00", "view"))
    val f = Behavior.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click")).orderBy("step").collect()
    assert(f.map(r => (r.getInt(0), r.getLong(2))).toSeq ===
      Seq((1, 2L), (2, 1L))) // null group reaches step 2
    val l = Behavior.funnelLatency(ev, "user_id", "ts", "event_type",
      Seq("view", "click")).collect()
    assert(l.map(_.getLong(2)).toSeq === Seq(1L)) // its latency row exists
  }

  test("gapFill: NULL key forward-fills its own grid; NULL ts dropped") {
    val ev = nullableEvents(
      (null, "2024-01-01 00:00:00", "a"),
      (null, "2024-01-01 00:02:00", "b"),
      (2L, null, "never-lands-anywhere"))
      .withColumn("value", lit(5.0))
    val g = Behavior.gapFill(ev, "user_id", "ts", "value", 60L)
      .orderBy("b").collect()
    assert(g.length === 3) // three 60s buckets for the null key
    assert(g.forall(_.isNullAt(0)))
    assert(g.map(r => (r.getBoolean(4), r.getDouble(3))).toSeq ===
      Seq((true, 5.0), (false, 5.0), (true, 5.0))) // middle bucket filled
    assert(!g.exists(r => r.getLong(1) < 0)) // null-ts row truly dropped
  }

  test("eventTransitions + intervalUnion: NULL key groups as one key") {
    val ev = nullableEvents(
      (null, "2024-01-01 00:01:00", "view"),
      (null, "2024-01-01 00:02:00", "click"))
    val tr = Behavior.eventTransitions(ev, "user_id", "ts", "event_type",
      "event_id").collect()
    assert(tr.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("view", "click"))) // the null user's adjacency counts
    val iu = Behavior.intervalUnion(
      ev.withColumn("mins", lit(1.0)), "user_id", "ts", "mins").collect()
    assert(iu.length === 1 && iu.head.isNullAt(0) &&
      iu.head.getLong(1) === 1L) // one island: 00:01-00:02 + 1min touch
  }

  test("activeUsers: NULL users filtered by documented contract") {
    val ev = nullableEvents(
      (null, "2024-01-01 00:01:00", "view"),
      (1L, "2024-01-01 00:01:00", "view"))
    val au = Behavior.activeUsers(ev, "user_id", "ts").collect()
    assert(au.map(_.getLong(1)).sum === 1L) // dau counts only user 1
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / product-analytics operators over event logs.
  *
  * Beyond-reference scope (SURVEY.md §2.11 L74–L76): the event-sequence
  * analytics an engine holding an `events` stream is asked for next —
  * ordered funnels, cohort retention, next-event transition matrices.
  *
  * Scale discipline shared by all three: every shuffle keys on the user
  * column (one exchange family, AQE-reusable), per-user state after each
  * reduction is ONE row (a timestamp or a week), never a collected event
  * list — a hot user costs a wider aggregation buffer, not a row
  * explosion. Ratios are single IEEE divisions of exact integer counts,
  * rendered at 9 dp (the house cross-engine float discipline).
  */
object Behavior {

  /** Ordered-funnel conversion with first-touch semantics: step k
    * completes at the user's EARLIEST `steps(k-1)`-typed event STRICTLY
    * after their step k−1 completion. One output row per step: users
    * reaching it, conversion vs step 1 and vs the previous step.
    *
    * Plan: per step, a filtered scan → equi-join on the gating frame →
    * map-combinable min aggregation, all keyed on `userCol`. Each step
    * frame (one row per surviving user) is consumed twice — by the next
    * step's gate and by its own count — so it is materialized once
    * (localCheckpoint, or durable parquet under `materializePath` for
    * cluster runs), the `corpusPrep` discipline; the funnel is linear in
    * the event volume, never the q_training_mix recompute shape.
    */
  /** The shared funnel gating chain: reached(k) = one (`__u`, `__ct`)
    * row per user whose earliest `steps(k)`-typed event STRICTLY after
    * their step k−1 completion exists — each frame materialized once
    * ([[Dedup.materializeBase]]) for its two consumers ([[funnel]]'s
    * counts / the next gate; [[funnelLatency]]'s step-time join). */
  private def reachedFrames(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, steps: Seq[String],
      materializePath: Option[String]): Seq[DataFrame] = {
    val base = events.select(col(userCol).as("__u"), col(tsCol).as("__t"),
      col(typeCol).as("__e"))
    steps.zipWithIndex
      .scanLeft(Option.empty[DataFrame]) { case (prev, (step, i)) =>
        val mine = base.filter(col("__e") === step)
        val gated = prev match {
          case None => mine
          case Some(p) =>
            // NULL-SAFE step gating (round-15 null-key sweep): the step-1
            // groupBy keeps NULL users as one group, so an equi-join here
            // silently barred that group from ever reaching step 2 — the
            // sessionize stitch-join bug class. `<=>` keeps the one-group
            // convention end to end; still a hash-join key for Spark.
            mine.join(p.select(col("__u").as("__up"), col("__ct").as("__prev")),
              col("__u") <=> col("__up")).drop("__up")
              .filter(col("__t") > col("__prev"))
        }
        val frame = gated.groupBy("__u").agg(min(col("__t")).as("__ct"))
        Some(Dedup.materializeBase(frame,
          materializePath.map(p => s"$p/step_$i")))
      }
      .flatten
  }

  /** GAP-BASED SESSIONIZATION — the atomization step every behavioral
    * metric downstream assumes (funnels per session, session length
    * distributions, engagement windows): a user's events ordered by
    * (ts, tie) split into sessions wherever the gap to the previous
    * event exceeds `gapSeconds`; output is one row per session with
    * 1-based per-user `session_id`, start/end/duration in exact epoch
    * MICROSECONDS (integer arithmetic end to end — no timestamp-render
    * or float parity risk), and the event count.
    *
    * Scale shape — the [[eventTransitions]] bucket-stitch discipline: a
    * hot user must never serialize through one window task, so the
    * boundary flag uses a within-(user, bucket) lag plus each bucket's
    * predecessor-last-event summary (one row per non-empty (user,
    * bucket)), and the session index is the distributed prefix sum of
    * flags: within-bucket running sum + per-bucket offsets windowed over
    * the user's BUCKET SUMMARY frame (rows = non-empty buckets, bounded
    * by retention, never by event volume). Every exchange keys on
    * (user) or (user, bucket). The final per-session aggregation is
    * min/max/count — map-combinable.
    *
    * Engine-exactness: flags compare exact integer micros against
    * gapSeconds·10⁶; a one-task SQL window (lag + running sum over the
    * user's full ordered history) reproduces every cell bit-for-bit —
    * the gate's oracle IS that one-task form. NULL user keys form ONE
    * group (the PARTITION BY / GROUP BY convention the oracle uses):
    * window partitions already treat NULL as a group, and the two
    * stitch joins use null-safe equality (`<=>`) on the user key so
    * null-user sessions survive rather than silently dropping at the
    * inner join.
    *
    * NULL-TS CONTRACT (round 15, spec-pinned): events with a NULL
    * timestamp are DROPPED before sessionization — an event with no
    * time belongs to no gap-defined session — by this form and
    * [[sessionizeNative]] alike (the native form's `session_window`
    * would exclude them anyway; the explicit filter makes the twin
    * row-for-row equivalence hold by construction, not by accident of
    * Spark's window null handling). The DuckDB oracles don't express
    * the filter because the events table never produces null ts; the
    * contract lives in BehaviorSpec. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long,
      bucketLen: String = "1 day"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be > 0, got $gapSeconds")
    val bucket = window(col(tsCol), bucketLen).getField("start")
    val base = events
      .filter(col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__t"),
        col(tieCol).as("__tie"), bucket.as("__b"))
    val inBucket = Window.partitionBy(col("__u"), col("__b"))
      .orderBy(col("__t"), col("__tie"))
    val overBuckets = Window.partitionBy(col("__u")).orderBy(col("__b"))
    // each bucket's first event needs the PREVIOUS non-empty bucket's
    // last event time — one summary row per (user, bucket)
    // NULL-SAFE stitch join: equi-join on __u would silently drop every
    // null-user event, while the window partitions (and the oracle's
    // PARTITION BY) keep NULL as one group — `<=>` is still a hash-join
    // key for Spark, so the plan shape is unchanged.
    def stitch(l: DataFrame, r: DataFrame): DataFrame = {
      val rr = r.withColumnRenamed("__u", "__ur")
        .withColumnRenamed("__b", "__br")
      l.join(rr, col("__u") <=> col("__ur") && col("__b") === col("__br"))
        .drop("__ur", "__br")
    }
    val summaries = base.groupBy("__u", "__b")
      .agg(max(col("__t")).as("__lastT"))
      .withColumn("__prevLast", lag(col("__lastT"), 1).over(overBuckets))
      .select("__u", "__b", "__prevLast")
    val flagged = stitch(base
      .withColumn("__wprev", lag(col("__t"), 1).over(inBucket)), summaries)
      .withColumn("__prev", coalesce(col("__wprev"), col("__prevLast")))
      .withColumn("__flag", when(col("__prev").isNull ||
        col("__t") - col("__prev") > gapSeconds * 1000000L, 1L)
        .otherwise(0L))
    val offsets = flagged.groupBy("__u", "__b")
      .agg(sum(col("__flag")).as("__bf"))
      .withColumn("__off", coalesce(sum(col("__bf")).over(
        overBuckets.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__u", "__b", "__off")
    stitch(flagged
      .withColumn("__cf", sum(col("__flag")).over(
        inBucket.rowsBetween(Window.unboundedPreceding, Window.currentRow))),
      offsets)
      .withColumn("__sid", col("__off") + col("__cf"))
      .groupBy(col("__u"), col("__sid"))
      .agg(min(col("__t")).as("session_start_us"),
        max(col("__t")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .select(col("__u").as(userCol), col("__sid").as("session_id"),
        col("session_start_us"), col("session_end_us"), col("n_events"),
        (col("session_end_us") - col("session_start_us")).as("duration_us"))
  }

  /** NATIVE-OPERATOR sessionization — the same per-session rows as
    * [[sessionize]] (minus the 1-based id) expressed through Spark's
    * built-in `session_window`, following the house preference order:
    * when Catalyst HAS the operator, gate the native form too so the
    * engine's own session merge (UpdatingSessions/MergingSessions with
    * in-sort merging) is pinned against the same oracle, and a user can
    * pick either shape knowingly.
    *
    * Two properties, both pinned/documented because both matter at
    * 100 TB:
    *  - BOUNDARY: Spark's session merge is on OVERLAP-OR-TOUCH — an
    *    event at exactly `last + gap` JOINS the session (measured,
    *    spec-pinned), which is the same strictly-greater split rule as
    *    [[sessionize]], so the two forms agree row-for-row and share
    *    the oracle.
    *  - SCALE: the native plan shuffles on the USER alone and merges
    *    each user's sessions inside one sorted reducer — a hot user
    *    serializes through one task, which is exactly what
    *    [[sessionize]]'s bucket-stitch exists to avoid. Prefer the
    *    native form for human-scale keys (its plan is simpler and
    *    sort-merges in one pass); prefer the bucket-stitch when any
    *    single key can dominate a partition.
    *
    * NULL ts: dropped, same as [[sessionize]] — see the NULL-TS
    * CONTRACT there (spec-pinned). */
  def sessionizeNative(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be > 0, got $gapSeconds")
    events
      .filter(col(tsCol).isNotNull)
      .groupBy(col(userCol),
        session_window(col(tsCol), s"$gapSeconds seconds"))
      .agg(min(unix_micros(col(tsCol))).as("session_start_us"),
        max(unix_micros(col(tsCol))).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .select(col(userCol), col("session_start_us"), col("session_end_us"),
        col("n_events"),
        (col("session_end_us") - col("session_start_us")).as("duration_us"))
  }

  /** Ordered-funnel conversion. NULL users: one ordinary group — the
    * step-1 groupBy keeps NULL as a group and the step-gating joins are
    * null-safe (`<=>`), so an anonymous-key group advances through
    * steps exactly like any user (round-15 null-key sweep; before it,
    * the equi-join silently barred NULL from step 2+ while counting it
    * at step 1). Spec-pinned. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      materializePath: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    // reached(k): one row per user who completed step k, with that time
    val reached =
      reachedFrames(events, userCol, tsCol, typeCol, steps, materializePath)
    val counts = reached.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
          col("users"))
    }.reduce(_.unionByName(_))
    // the remaining windows/joins run on a steps-sized frame (post-agg)
    val first = counts.filter(col("step") === 1)
      .select(col("users").as("__first"))
    val w = Window.orderBy("step")
    counts.crossJoin(broadcast(first))
      .withColumn("prev_users", lag(col("users"), 1).over(w))
      .select(col("step"), col("event_type"), col("users"),
        round(col("users").cast("double") / col("__first"), 9)
          .as("conv_from_first"),
        when(col("prev_users").isNotNull,
          round(col("users").cast("double") / col("prev_users"), 9))
          .as("conv_from_prev"))
  }

  /** Funnel step LATENCY — the time-to-convert readout [[funnel]]'s
    * counts can't show (two funnels with identical conversion can hide
    * a 10-second checkout and a 3-day one; latency is what the
    * follow-up nudge/timeout/abandonment decisions key on): for every
    * step k ≥ 2, the converting users' seconds between their step-k−1
    * and step-k completions — exact long epoch diffs — summarized as
    * exact-count n, a DECIMAL-exact 6-dp mean, and PICKED p50/p90 off
    * the latency-domain ECDF (the [[graft.ops.Stats.robustScale]] cut
    * discipline — existing values, no interpolation convention).
    * Every step 2..K gets a row even with ZERO converters (n = 0, null
    * latencies) — lockstep with [[funnel]] reporting the step with 0
    * users.
    *
    * Plan: the [[reachedFrames]] gating chain (linear in event volume,
    * each frame materialized once), one (step, latency) count shuffle,
    * cumulative windows on the latency-domain summary frame. */
  def funnelLatency(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      materializePath: Option[String] = None): DataFrame = {
    require(steps.size >= 2, "funnelLatency: need at least two steps")
    val reached =
      reachedFrames(events, userCol, tsCol, typeCol, steps, materializePath)
    val lats = reached.sliding(2).zipWithIndex.map {
      case (Seq(prev, cur), i) =>
        // null-safe like reachedFrames' gating: a NULL-user group that
        // converted must contribute its latency row (round-15 sweep)
        cur.join(prev.select(col("__u").as("__up"), col("__ct").as("__pct")),
            col("__u") <=> col("__up")).drop("__up")
          .select(lit(i + 2).as("step"), lit(steps(i + 1)).as("event_type"),
            (unix_timestamp(col("__ct")) - unix_timestamp(col("__pct")))
              .as("__lat"))
    }.reduce(_.unionByName(_))
    // Steps dimension (2..K): a step NOBODY converted to must still
    // surface — n = 0, null latencies — in lockstep with funnel()
    // reporting the step with 0 users (a vanishing row reads as "step
    // not measured", not "nobody converted").
    val spark = events.sparkSession
    val stepDim = spark.createDataFrame(
      spark.sparkContext.parallelize(
        steps.zipWithIndex.drop(1).map { case (nm, i) =>
          org.apache.spark.sql.Row(i + 1, nm) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("step",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val cells = lats.groupBy("step", "event_type", "__lat")
      .agg(count(lit(1)).as("__c"))
    val wLat = Window.partitionBy(col("step")).orderBy(col("__lat"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("__cum", sum(col("__c")).over(wLat))
      .withColumn("__n",
        max(col("__cum")).over(Window.partitionBy(col("step"))))
    def pick(q: Double, name: String): DataFrame = cum
      .filter(col("__cum") >= greatest(lit(1L),
        ceil(lit(q) * col("__n")).cast("long")))
      .groupBy("step").agg(min(col("__lat")).as(name))
    val agg = cells.groupBy("step", "event_type")
      .agg(sum(col("__c")).as("n"),
        sum((col("__lat").cast("decimal(19,0)") * col("__c"))
          .cast("decimal(38,0)")).cast("decimal(38,0)").as("__s"))
      .withColumn("mean_sec",
        round(col("__s").cast("double") / col("n").cast("double"), 6))
      .drop("__s")
    stepDim
      .join(agg, Seq("step", "event_type"), "left")
      .join(broadcast(pick(0.5, "p50_sec")), Seq("step"), "left")
      .join(broadcast(pick(0.9, "p90_sec")), Seq("step"), "left")
      .select(col("step"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("mean_sec"), col("p50_sec"), col("p90_sec"))
  }

  /** Weekly cohort retention: users cohorted by the Monday-truncated week
    * of their first event; `retention(c, k)` = distinct cohort-c users
    * active in week c+k over the cohort size. Exact integer counts, one
    * IEEE division per output row.
    *
    * Plan: distinct (user, week) — the only pass over raw events — is
    * materialized once and feeds both the per-user min (cohort week,
    * map-combinable) and the offset join; everything shuffles on `__u`
    * until the final cohort-sized aggregation.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      maxWeeks: Int = 4,
      materializePath: Option[String] = None): DataFrame = {
    require(maxWeeks >= 0, "cohortRetention: maxWeeks must be >= 0")
    val weeks = Dedup.materializeBase(
      events.select(col(userCol).as("__u"),
        date_trunc("week", col(tsCol)).cast("date").as("__w")).distinct(),
      materializePath.map(p => s"$p/user_weeks"))
    val cohort = weeks.groupBy("__u").agg(min(col("__w")).as("__c"))
    val sizes = cohort.groupBy("__c").agg(count(lit(1)).as("cohort_size"))
    weeks.join(cohort, Seq("__u"))
      .withColumn("week_offset",
        (datediff(col("__w"), col("__c")) / 7).cast("int"))
      .filter(col("week_offset") <= maxWeeks)
      .groupBy(col("__c"), col("week_offset"))
      .agg(count_distinct(col("__u")).as("active_users"))
      .join(sizes, Seq("__c"))
      .select(date_format(col("__c"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("active_users"), col("cohort_size"),
        round(col("active_users").cast("double") / col("cohort_size"), 9)
          .as("retention"))
  }

  /** Per-user MOVING-window metric features (lag / rolling mean — the
    * feature-engineering primitive for sequence models and anomaly
    * baselines): over each user's timeline in (orderCol) order, the
    * previous value and the inclusive trailing `window`-row mean.
    * DECIMAL accumulation keeps the rolling sum exact and
    * order-established; the mean is one IEEE division per row. One
    * user-partitioned window — the same shuffle family as every other
    * operator on this table. A pathologically hot user serializes its
    * own timeline through one task (frames straddle any split, so the
    * eventTransitions bucket-stitch doesn't apply verbatim); for that
    * regime pre-bucket the timeline and accept frame resets, or carry
    * the k−1 boundary rows — documented trade, not silent. */
  def rollingFeatures(events: DataFrame, userCol: String, orderCol: String,
      metricCol: String, window: Int = 3): DataFrame = {
    require(window >= 1, s"rollingFeatures: window must be >= 1")
    val w = Window.partitionBy(col(userCol)).orderBy(col(orderCol))
    val wk = w.rowsBetween(-(window - 1), Window.currentRow)
    events.select(col(userCol), col(orderCol), col(metricCol))
      .withColumn("prev_value", lag(col(metricCol), 1).over(w))
      .withColumn("__n", count(lit(1)).over(wk))
      .withColumn("rolling_mean",
        round(sum(col(metricCol).cast("decimal(14,2)")).over(wk)
          .cast("double") / col("__n"), 6))
      .drop("__n")
  }

  /** Two-sample A/B experiment readout (Welch's t): units split by
    * `unitCol % 2` (the deterministic stand-in for an assignment
    * column — pass a real one by deriving `unitCol` upstream), per-unit
    * metric totals FIRST (the randomization unit is the user, so
    * per-event analysis would understate variance), then per-variant
    * moments and the Welch statistic.
    *
    * Determinism: per-unit totals and per-variant Σm, Σm² accumulate in
    * DECIMAL (exact, order-free); means/variances/t are a fixed
    * parenthesization of IEEE ops over those exact operands, rendered at
    * 6 dp. Two user-keyed shuffles + a 2-row moments frame. */
  def abTestStats(events: DataFrame, unitCol: String,
      metricCol: String): DataFrame = {
    val perUnit = events.groupBy(col(unitCol).as("u"))
      .agg(sum(col(metricCol).cast("decimal(14,2)"))
        .cast("decimal(14,2)").as("m"))
      .withColumn("variant", (col("u") % 2).cast("int"))
    val stats = perUnit.groupBy("variant").agg(
      count(lit(1)).as("n"),
      sum(col("m")).cast("double").as("s"),
      sum(col("m") * col("m")).cast("double").as("ss"))
    def side(v: Int, c: String) = max(when(col("variant") === v, col(c)))
    val w = stats.agg(
      side(0, "n").as("n0"), side(1, "n").as("n1"),
      side(0, "s").as("s0"), side(1, "s").as("s1"),
      side(0, "ss").as("ss0"), side(1, "ss").as("ss1"))
    val mean0 = col("s0") / col("n0")
    val mean1 = col("s1") / col("n1")
    val varTerm0 = ((col("ss0") - (col("s0") * col("s0")) / col("n0")) /
      (col("n0") - 1)) / col("n0")
    val varTerm1 = ((col("ss1") - (col("s1") * col("s1")) / col("n1")) /
      (col("n1") - 1)) / col("n1")
    w.select(col("n0"), col("n1"),
      round(mean0, 6).as("mean0"), round(mean1, 6).as("mean1"),
      round((mean1 - mean0) / sqrt(varTerm1 + varTerm0), 6).as("t_stat"))
  }

  /** Next-event transition matrix (first-order Markov estimate): for each
    * (from, to) adjacent pair in a user's timeline — ordered by (ts,
    * tieCol), the unique-key house tie-break — the transition count and
    * its row-normalized probability.
    *
    * Skew design: a plain per-user `lead` window serializes a hot user's
    * ENTIRE history through one task (the skew run plants ~half of all
    * events on one user — at corpus scale that's the stage). Instead the
    * timeline splits into (user, time-bucket) windows — adjacency within
    * a bucket is an ordinary bounded window — and the cross-bucket
    * adjacencies are STITCHED: each bucket reduces to its (first, last)
    * events via map-combinable min/max struct aggregation, and a per-user
    * window over the bucket SUMMARIES (≤ time-range/bucketLen rows per
    * user, however hot) links each bucket's last event to the next
    * bucket's first. Identical output to the naive single window —
    * pinned by a differential test.
    *
    * NULL keys: one ordinary group — every exchange is a window
    * PARTITION BY or GROUP BY (both keep NULL as a group, matching the
    * DuckDB convention); no equi-join on the user key exists to drop
    * them (round-15 null-key sweep, spec-pinned). */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String,
      bucketLen: String = "1 day"): DataFrame = {
    val bucket = window(col(tsCol), bucketLen).getField("start")
    val base = events.select(col(userCol).as("__u"), col(tsCol).as("__t"),
      col(tieCol).as("__tie"), col(typeCol).as("__e"),
      bucket.as("__b"))
    val inBucket = Window.partitionBy(col("__u"), col("__b"))
      .orderBy(col("__t"), col("__tie"))
    val within = base
      .withColumn("to_type", lead(col("__e"), 1).over(inBucket))
      .filter(col("to_type").isNotNull)
      .select(col("__e").as("from_type"), col("to_type"))
    val key = struct(col("__t"), col("__tie"), col("__e"))
    val summaries = base.groupBy("__u", "__b")
      .agg(min(key).as("__first"), max(key).as("__last"))
    val overBuckets = Window.partitionBy(col("__u")).orderBy(col("__b"))
    val boundary = summaries
      .withColumn("__nextFirst", lead(col("__first"), 1).over(overBuckets))
      .filter(col("__nextFirst").isNotNull)
      .select(col("__last.__e").as("from_type"),
        col("__nextFirst.__e").as("to_type"))
    val totals = Window.partitionBy(col("from_type"))
    within.unionByName(boundary)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n").cast("double") / sum(col("n")).over(totals), 9))
  }

  /** Regular-interval time-series with forward fill — the resample step
    * before any sequence model or dashboard reads an event stream: each
    * key's observations bucket to `stepSeconds`-wide epoch buckets
    * (DECIMAL-exact per-bucket sums), the grid of EVERY bucket between
    * the key's first and last observation is generated in-plan
    * (`sequence` + explode — a narrow generate, rows ∝ output, no
    * driver loop), and empty buckets carry the last observed value
    * forward (`last(ignoreNulls)` over the key's bucket order).
    *
    * Scale shape: one (key, bucket) aggregation, one key aggregation for
    * the spans, one equi-join grid↔observed on (key, bucket), one
    * per-key window — every exchange keys on the key column. A key's
    * cost is its own span/step (bounded by data retention), never the
    * corpus. Integer bucket arithmetic (epoch div) — engine-exact; the
    * filled value is an exact DECIMAL carried unchanged.
    *
    * `maxBucketsPerKey` guards the generate: a key whose span/step
    * exceeds it (a 10-year span at 1-second steps = a 300M-row explode
    * per key) raises IN-PLAN rather than OOMing an executor. */
  def gapFill(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, stepSeconds: Long,
      maxBucketsPerKey: Long = 1000000L): DataFrame = {
    require(stepSeconds >= 1, s"stepSeconds must be >= 1, got $stepSeconds")
    // floor, not cast: Spark double→long casts truncate but DuckDB's
    // round — floor() agrees (epochs here are non-negative anyway)
    val bucket = floor(unix_timestamp(col(tsCol)).cast("double") /
      lit(stepSeconds.toDouble)).cast("long") * stepSeconds
    // NULL-TS observations are dropped by contract (a time-less
    // observation cannot land in a time bucket); previously they formed
    // a null bucket the span arithmetic silently ignored. NULL keys are
    // one ordinary group (round-15 null-key sweep; spec-pinned).
    val observed = events
      .filter(col(tsCol).isNotNull)
      .select(col(userCol).as("u"), bucket.as("b"),
        col(valueCol).cast("decimal(14,2)").as("__v"))
      .groupBy("u", "b")
      .agg(sum(col("__v")).cast("decimal(24,2)").as("v_obs"))
    val spans = observed.groupBy("u")
      .agg(min(col("b")).as("__lo"), max(col("b")).as("__hi"))
      .withColumn("__nb", (col("__hi") - col("__lo")) / lit(stepSeconds) + 1L)
      .withColumn("__lo", when(col("__nb") <= maxBucketsPerKey, col("__lo"))
        .otherwise(raise_error(concat(lit("gapFill: key "),
          col("u").cast("string"), lit(" spans "), col("__nb").cast("string"),
          lit(" buckets > maxBucketsPerKey")))))
    val grid = spans.select(col("u"),
      explode(sequence(col("__lo"), col("__hi"), lit(stepSeconds))).as("b"))
    val w = Window.partitionBy(col("u")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL-SAFE on the key: the grid derives from the same groupBy that
    // keeps NULL as one group — an equi-join here returned the null
    // key's whole grid as "never observed" (v_obs all null) while its
    // observations existed. b is never null (null ts filtered above).
    grid.join(observed
        .withColumnRenamed("u", "__uo").withColumnRenamed("b", "__bo"),
        col("u") <=> col("__uo") && col("b") === col("__bo"), "left")
      .drop("__uo", "__bo")
      // DOUBLE output (exact decimal sums upstream): a decimal column
      // would stringify "120.40" vs the oracle's float "120.4" under
      // the driver's hash compare
      .withColumn("v_obs", col("v_obs").cast("double"))
      .withColumn("v_filled", last(col("v_obs"), ignoreNulls = true).over(w))
      .withColumn("is_observed", col("v_obs").isNotNull)
  }

  /** Half-life-bucketed exponential time-decay score per key — the
    * recency-weighted engagement signal (recommendation freshness, user
    * activity ranking): each event contributes
    * value · 0.5^(ageDays div halfLifeDays), age measured in whole days
    * back from `asOfEpoch` (integer floor division — the decay is a step
    * function of WHOLE half-lives, by design).
    *
    * Engine-exactness: the exponent is a small non-negative INTEGER, so
    * 0.5^n is an exactly-representable binary double any IEEE pow
    * returns exactly; value·0.5^n is one correctly-rounded multiply;
    * each term then quantizes to DECIMAL(18,6) (round 6) so the per-key
    * sum is order- and partition-invariant and a SQL oracle replays it
    * bit-for-bit. Ages beyond 62 half-lives clamp to weight 0 (the
    * double would underflow anyway at 1074).
    *
    * Scale: one narrow scoring scan + one map-combinable key
    * aggregation — a single shuffle on the key. */
  def decayScore(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, asOfEpoch: Long, halfLifeDays: Long): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    // floor(correctly-rounded double division) == the mathematical floor
    // here (operands << 2^53, so the quotient can only round onto an
    // integer when it IS one) — and unlike cast(double as long), floor
    // agrees between engines (Spark casts truncate, DuckDB casts round)
    val age = (lit(asOfEpoch) - unix_timestamp(col(tsCol)).cast("long"))
      .cast("double")
    val periods = floor(age / lit(86400.0 * halfLifeDays)).cast("long")
    val term = when(periods < 0L || periods > 62L, lit(0.0))
      .otherwise(col(valueCol) * pow(lit(0.5), periods.cast("double")))
    events
      .select(col(userCol).as("u"),
        round(term, 6).cast("decimal(18,6)").as("__t"))
      .groupBy("u")
      // the SUM stays DECIMAL (order-invariant); the OUTPUT is DOUBLE —
      // a decimal column stringifies as "685.313750" vs the oracle's
      // float "685.31375" under the driver's hash compare, and
      // decimal→double conversion is correctly rounded in both engines
      .agg(sum(col("__t")).cast("decimal(28,6)").cast("double")
          .as("decay_score"),
        count(lit(1)).as("n_events"))
  }

  /** COMPOSED per-user FEATURE MART — the feature-store materialization
    * every activation/churn model reads: one row per user carrying the
    * half-life decay score ([[decayScore]]), time-weighted average value
    * ([[timeWeightedAvg]]), modal event type ([[Stats.modePerGroup]]),
    * distinct-type breadth, and the user's latest decidable churn label
    * ([[churnLabels]]). Composition is the point AND the gate: each
    * stage is individually oracled, but only a chained oracle catches a
    * composition bug (a stage reading pre-filter rows, a join dropping
    * null-feature users).
    *
    * Materialization discipline: the narrow (user, ts, value, type)
    * projection is materialized ONCE ([[Dedup.materializeBase]]; pass
    * `materializePath` for the cluster-durable form) and every stage
    * reads the materialized base — five stages cost one corpus scan
    * plus five summary-sized passes, never five corpus scans (the
    * q_training_mix lesson). Every stage keys on the user, so the final
    * assembly joins co-partition in one exchange family. */
  def userFeatureMart(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, typeCol: String, asOfEpoch: Long,
      halfLifeDays: Long, horizonWeeks: Int = 1,
      materializePath: Option[String] = None): DataFrame = {
    val base = Dedup.materializeBase(
      events.select(col(userCol).as("user_id"), col(tsCol).as("ts"),
        col(valueCol).as("value"), col(typeCol).as("etype")),
      materializePath.map(_ + "/base"))
    val decay = decayScore(base, "user_id", "ts", "value", asOfEpoch,
      halfLifeDays)
    val twa = timeWeightedAvg(base, "user_id", "ts", "value")
      .select(col("u"), col("twa"))
    val mode = Stats.modePerGroup(base, "etype", "user_id")
      .select(col("g").as("u"), col("mode_value").as("mode_type"),
        col("n_mode"))
    val breadth = base.groupBy(col("user_id").as("u"))
      .agg(count_distinct(col("etype")).as("n_types"))
    // latest decidable churn label (max week among non-null labels)
    val churn = churnLabels(base, "user_id", "ts", horizonWeeks)
      .filter(col("churned").isNotNull)
      .groupBy("u")
      .agg(max(struct(col("week"), col("churned"))).as("__m"))
      .select(col("u"), col("__m.week").as("last_labeled_week"),
        col("__m.churned").as("churned_last"))
    decay.join(twa, Seq("u"))
      .join(mode, Seq("u"))
      .join(breadth, Seq("u"))
      .join(churn, Seq("u"), "left")
  }

  /** Cumulative-distinct ADOPTION curve: for each (user, active week),
    * how many distinct event types the user has touched so far and how
    * many are NEW that week — the breadth-of-engagement feature (and,
    * on a corpus, the "new domains/sources seen over time" audit).
    *
    * NEVER builds a per-row distinct-so-far set: each (user, type)
    * collapses to its FIRST week (one map-combinable min), new-type
    * counts aggregate per (user, week), and one running sum over the
    * user's WEEK SUMMARIES (rows ≤ weeks-per-user) cumulates — the
    * summary-window discipline; exact integers throughout. Output rows
    * = the user's ACTIVE weeks (weeks with ≥1 event), with `new_types`
    * possibly 0 (active but nothing new). */
  def cumulativeDistinct(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String): DataFrame = {
    val week = floor(unix_timestamp(col(tsCol)).cast("double") /
      lit(604800.0)).cast("long")
    val base = events.select(col(userCol).as("u"), week.as("week"),
      col(typeCol).as("__t"))
    val activeWeeks = base.select("u", "week").distinct()
    val firstSeen = base.groupBy("u", "__t").agg(min(col("week")).as("week"))
    val newPerWeek = firstSeen.groupBy("u", "week")
      .agg(count(lit(1)).as("new_types"))
    val w = Window.partitionBy(col("u")).orderBy(col("week"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    activeWeeks.join(newPerWeek, Seq("u", "week"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("cum_types", sum(col("new_types")).over(w))
  }

  /** Weekly CHURN labels per user — the supervised-learning target every
    * retention model trains on: for each (user, active week), did the
    * user go quiet for more than `horizonWeeks` weeks afterwards?
    * Weeks are integer epoch-day floor-divisions (engine-exact, the
    * cohortRetention arithmetic); a (user, week) whose horizon extends
    * past the corpus's last observed week is CENSORED (label null — the
    * data cannot answer yet, and training on it as "churned" is the
    * classic leakage bug this column exists to prevent).
    *
    * Scale shape: distinct (user, week) first (one shuffle, activity
    * collapses to ≤ weeks-per-user rows per user), ONE lead window over
    * those per-user week summaries, the global max week via a broadcast
    * single-row cross join. Pure integer comparisons. */
  def churnLabels(events: DataFrame, userCol: String, tsCol: String,
      horizonWeeks: Int = 2): DataFrame = {
    require(horizonWeeks >= 1, s"horizonWeeks must be >= 1, got $horizonWeeks")
    val week = floor(unix_timestamp(col(tsCol)).cast("double") /
      lit(604800.0)).cast("long")
    val weekly = events.select(col(userCol).as("u"), week.as("week"))
      .distinct()
    val maxWeek = weekly.agg(max(col("week")).as("__maxw"))
    val w = Window.partitionBy(col("u")).orderBy(col("week"))
    weekly
      .withColumn("__next", lead(col("week"), 1).over(w))
      .crossJoin(broadcast(maxWeek))
      .select(col("u"), col("week"),
        // a return WITHIN the horizon decides "not churned" even when the
        // horizon extends past the data; only the undecidable tail is null
        when(col("__next").isNotNull &&
            col("__next") <= col("week") + horizonWeeks, lit(false))
          .when(col("week") + horizonWeeks > col("__maxw"),
            lit(null).cast("boolean"))
          .otherwise(lit(true)).as("churned"))
  }

  /** Time-weighted average per key over IRREGULAR samples — the honest
    * mean for unevenly-spaced measurements (a value that held for an
    * hour must outweigh one that held a second; the row-mean is wrong
    * the moment sampling is load-correlated): each observation is
    * weighted by how long it remained current (microseconds until the
    * key's next observation; the final observation has no duration and
    * carries weight 0, the right-open-interval convention).
    *
    * Exactness: durations are exact integer MICROSECONDS (unix_micros —
    * no truncation mismatch between engines), weights multiply
    * DECIMAL(14,2) values into exact DECIMAL(38,2) sums, and the single
    * IEEE division renders at 6 dp. One per-key lead window + one
    * map-combinable key aggregation — one exchange family on the key;
    * per-key cost is the key's own history (the rollingFeatures
    * contract). Keys with a single observation emit null (no interval
    * to average over). */
  def timeWeightedAvg(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    // value as the tie-break: same-instant observations order
    // deterministically (and identically in any SQL oracle), and a
    // same-instant pair contributes v_first·0 either way
    val w = Window.partitionBy(col("u")).orderBy(col("__us"), col("__v"))
    events
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("__us"),
        col(valueCol).cast("decimal(14,2)").as("__v"))
      .withColumn("__dur", coalesce(lead(col("__us"), 1).over(w) -
        col("__us"), lit(0L)))
      .groupBy("u")
      .agg(sum((col("__v") * col("__dur")).cast("decimal(38,2)")).as("__ws"),
        sum(col("__dur")).as("__tot"), count(lit(1)).as("n_events"))
      .select(col("u"),
        when(col("__tot") > 0L,
          round(col("__ws").cast("double") / col("__tot"), 6)).as("twa"),
        col("n_events"))
  }

  /** Per-key CUSUM drift detection over regular-interval bucket sums —
    * the sequential change-point monitor (Page 1954) behind "this
    * user/source/feed shifted its level" alerts that a fixed threshold
    * on raw values misses (a small persistent shift accumulates; a
    * one-bucket spike does not).
    *
    * S⁺ₜ = max(0, S⁺ₜ₋₁ + xₜ − allowance) flags upward drift when it
    * clears `threshold`; S⁻ mirrors downward. The recursion is NOT
    * computed recursively: with Pₜ = Σᵢ≤ₜ (xᵢ − allowance),
    * S⁺ₜ = Pₜ − min(0, min_{j≤t} Pⱼ) and
    * S⁻ₜ = max(0, max_{j≤t} Pⱼ) − Pₜ — a prefix sum plus a running
    * min/max, three frames of ONE per-key window over the key's dense
    * bucket grid (empty buckets count as x = 0: silence after traffic
    * IS downward drift). Same grid machinery as [[gapFill]]
    * (`maxBucketsPerKey` raise guard, rows ∝ output).
    *
    * Exactness: bucket sums quantize to DECIMAL(24,2), the allowance to
    * DECIMAL(18,6), so P and both running extrema are exact decimals any
    * engine replays bit-for-bit; the outputs cast to DOUBLE at the edge
    * (correctly rounded identically in both engines — the GateSchemaSpec
    * rule), and the flag compares happen on those exact quantities. */
  def cusumDrift(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepSeconds: Long, allowance: Double,
      threshold: Double, maxBucketsPerKey: Long = 1000000L): DataFrame = {
    require(stepSeconds >= 1, s"stepSeconds must be >= 1, got $stepSeconds")
    require(threshold > 0.0, s"threshold must be > 0, got $threshold")
    val bucket = floor(unix_timestamp(col(tsCol)).cast("double") /
      lit(stepSeconds.toDouble)).cast("long") * stepSeconds
    val observed = events
      .select(col(keyCol).as("u"), bucket.as("b"),
        col(valueCol).cast("decimal(14,2)").as("__v"))
      .groupBy("u", "b")
      .agg(sum(col("__v")).cast("decimal(24,2)").as("__x"))
    val spans = observed.groupBy("u")
      .agg(min(col("b")).as("__lo"), max(col("b")).as("__hi"))
      .withColumn("__nb", (col("__hi") - col("__lo")) / lit(stepSeconds) + 1L)
      .withColumn("__lo", when(col("__nb") <= maxBucketsPerKey, col("__lo"))
        .otherwise(raise_error(concat(lit("cusumDrift: key "),
          col("u").cast("string"), lit(" spans "), col("__nb").cast("string"),
          lit(" buckets > maxBucketsPerKey")))))
    val grid = spans.select(col("u"),
      explode(sequence(col("__lo"), col("__hi"), lit(stepSeconds))).as("b"))
    val w = Window.partitionBy(col("u")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // DECIMAL(30,6), not 38: P − runMin needs one more integer digit
    // than P itself, and a precision-39 requirement makes DuckDB (and
    // ANSI engines generally) silently promote the subtraction to
    // DOUBLE — 30 leaves headroom on BOTH sides of the arithmetic
    val zero = lit(0).cast("decimal(30,6)")
    grid.join(observed, Seq("u", "b"), "left")
      .withColumn("__x", coalesce(col("__x"), lit(0).cast("decimal(24,2)")))
      .withColumn("__p", sum(col("__x") -
        lit(allowance).cast("decimal(18,6)")).over(w).cast("decimal(30,6)"))
      .withColumn("__rmin", min(col("__p")).over(w))
      .withColumn("__rmax", max(col("__p")).over(w))
      .select(col("u"), col("b"), col("__x").cast("double").as("x"),
        (col("__p") - least(col("__rmin"), zero)).cast("double").as("s_pos"),
        (greatest(col("__rmax"), zero) - col("__p")).cast("double")
          .as("s_neg"))
      .withColumn("drift_up", col("s_pos") > threshold)
      .withColumn("drift_down", col("s_neg") > threshold)
  }

  /** Per-key UNION of overlapping time intervals ("how much wall-clock
    * was this user actually active?"): each event opens a span
    * [ts, ts + value·minutes); overlapping or touching spans merge into
    * islands (the gaps-and-islands reduction), and the output is one row
    * per key with the island count, total covered microseconds, longest
    * island, and member-interval count — coverage WITHOUT double-counting
    * overlap, which a plain sum(duration) gets wrong.
    *
    * Exactness: starts are integer `unix_micros`; durations quantize the
    * double minutes through DECIMAL(14,2)·60e6 — an integral-valued exact
    * product — then to BIGINT, so island bounds are exact integers in
    * both engines. Island id = running count of `start > max(previous
    * ends)` over a (start, end)-ordered per-key window; duplicate
    * (start, end) rows are order-ambiguous between engines but
    * contribute the same running max, so the island assignment is
    * deterministic. Negative durations clamp to a point interval.
    *
    * Scale: ONE shuffle on the key; per-key state is the window sort —
    * bounded by a key's own event count, never the table.
    *
    * NULL keys: one ordinary group (window PARTITION BY + GROUP BY
    * only — the DuckDB convention; round-15 null-key sweep,
    * spec-pinned). */
  def intervalUnion(events: DataFrame, keyCol: String, tsCol: String,
      minutesCol: String): DataFrame = {
    val s = unix_micros(col(tsCol))
    val dur = (col(minutesCol).cast("decimal(14,2)") * lit(60000000L))
      .cast("long")
    val spans = events.select(col(keyCol).as("u"), s.as("s"),
      (s + greatest(dur, lit(0L))).as("e"))
    val w = Window.partitionBy(col("u")).orderBy(col("s"), col("e"))
    val prevMax = max(col("e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val island = sum(
      when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spans.withColumn("island", island)
      .groupBy(col("u"), col("island"))
      .agg(min(col("s")).as("__is"), max(col("e")).as("__ie"),
        count(lit(1)).as("__n"))
      .groupBy(col("u"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is")).as("covered_us"),
        max(col("__ie") - col("__is")).as("longest_us"),
        sum(col("__n")).as("n_intervals"))
  }

  /** Distinct (basket, item) frame with the in-plan HOT-BASKET guard:
    * [[associationRules]] and [[itemCosine]] self-join on the basket
    * key, so one basket with W items costs W²/2 pairs — bounded by
    * domain on order lines, silently quadratic on a web-scale
    * "items per session" feed with one hot session. Any basket wider
    * than `maxBasketWidth` raises in-plan naming the
    * [[graft.ops.Pipeline.capPerKey]] fallback (the
    * prefixFilterJaccardPairs guard pattern — never a driver-side
    * check). One map-combinable width count + one basket-keyed join. */
  private def guardedBasketItems(df: DataFrame, basketCol: String,
      itemCol: String, maxBasketWidth: Long, op: String): DataFrame = {
    require(maxBasketWidth >= 1L,
      s"maxBasketWidth must be >= 1, got $maxBasketWidth")
    val items = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .filter(col("i").isNotNull).distinct()
    val widths = items.groupBy("b").agg(count(lit(1)).as("__w"))
    items.join(widths.hint("SHUFFLE_HASH"), Seq("b"))
      .withColumn("i", when(col("__w") <= maxBasketWidth, col("i"))
        .otherwise(raise_error(concat(lit(s"$op: basket "),
          col("b").cast("string"), lit(" holds "),
          col("__w").cast("string"),
          lit(s" distinct items > maxBasketWidth=$maxBasketWidth — the" +
            " basket self-join is quadratic per basket; cap hot baskets" +
            " with Pipeline.capPerKey first, or raise maxBasketWidth")))))
      .select("b", "i")
  }

  /** Pairwise ASSOCIATION RULES over item baskets (market-basket
    * affinity — "orders containing A also contain B"): for every
    * directed item pair co-occurring in ≥ `minPairBaskets` baskets,
    * support = P(A∧B), confidence = P(B|A), lift = confidence / P(B).
    * Lift > 1 is genuine affinity; confidence alone just restates B's
    * popularity — which is why the rule readout carries all three.
    *
    * Scale shape: baskets dedupe to distinct (basket, item) once; the
    * pair generator is a self-equi-join ON THE BASKET KEY, so per-basket
    * work is quadratic in basket SIZE (bounded small by domain — order
    * lines, not corpus rows) and total work stays linear in baskets.
    * Item frequencies join back on the item key (two map-combinable
    * count shuffles); the basket total rides a broadcast 1-row frame —
    * no driver action. Ratios are single IEEE divisions of exact counts
    * with fixed parenthesization, 6-dp renders. Baskets wider than
    * `maxBasketWidth` raise in-plan ([[guardedBasketItems]]). */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairBaskets: Long = 2L,
      maxBasketWidth: Long = 10000L): DataFrame = {
    require(minPairBaskets >= 1L,
      s"minPairBaskets must be >= 1, got $minPairBaskets")
    val items = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .filter(col("i").isNotNull).distinct()
    val guarded = guardedBasketItems(df, basketCol, itemCol,
      maxBasketWidth, "associationRules")
    val nBaskets = items.agg(
      count_distinct(col("b")).as("__nb"))
    val itemN = items.groupBy(col("i")).agg(count(lit(1)).as("__in"))
    val pairs = guarded.as("a")
      .join(items.as("c"), col("a.b") === col("c.b") &&
        col("a.i") < col("c.i"))
      .groupBy(col("a.i").as("x"), col("c.i").as("y"))
      .agg(count(lit(1)).as("__pn"))
      .filter(col("__pn") >= minPairBaskets)
    // both rule directions from one undirected pair row
    val directed = pairs.select(explode(array(
        struct(col("x").as("antecedent"), col("y").as("consequent"),
          col("__pn")),
        struct(col("y").as("antecedent"), col("x").as("consequent"),
          col("__pn")))).as("r"))
      .select(col("r.antecedent"), col("r.consequent"), col("r.__pn"))
    val pn = col("__pn").cast("double")
    val an = col("__an").cast("double")
    val cn = col("__cn").cast("double")
    val nb = col("__nb").cast("double")
    directed
      .join(itemN.select(col("i").as("antecedent"), col("__in").as("__an")),
        Seq("antecedent"))
      .join(itemN.select(col("i").as("consequent"), col("__in").as("__cn")),
        Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"),
        col("__pn").as("pair_baskets"), col("__an").as("ante_baskets"),
        col("__cn").as("cons_baskets"),
        round(pn / nb, 6).as("support"),
        round(pn / an, 6).as("confidence"),
        round((pn / an) / (cn / nb), 6).as("lift"))
  }

  /** Item–item cosine similarity from basket co-occurrence — the
    * collaborative-filtering standard beside [[associationRules]]' lift
    * (lift is a probability ratio and explodes for rare pairs; cosine
    * c_ij/√(c_i·c_j) is the bounded [0,1] geometry the "customers also
    * bought" ranker actually uses). One row per UNORDERED pair
    * (item_a < item_b).
    *
    * Exactness: counts are exact longs, cosine is one
    * fixed-parenthesization double expression (pn / (√an·√cn)), 6-dp.
    *
    * Shape: identical to [[associationRules]] — distinct (basket, item)
    * once, pair counts via the basket-keyed self-join (per-basket
    * quadratic bounded by basket width, linear in baskets), item counts
    * broadcast back onto the pair frame. Baskets wider than
    * `maxBasketWidth` raise in-plan ([[guardedBasketItems]]). */
  def itemCosine(df: DataFrame, basketCol: String, itemCol: String,
      minPairBaskets: Long = 2L,
      maxBasketWidth: Long = 10000L): DataFrame = {
    require(minPairBaskets >= 1L,
      s"minPairBaskets must be >= 1, got $minPairBaskets")
    val items = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .filter(col("i").isNotNull).distinct()
    val guarded = guardedBasketItems(df, basketCol, itemCol,
      maxBasketWidth, "itemCosine")
    val itemN = items.groupBy(col("i")).agg(count(lit(1)).as("__in"))
    guarded.as("a")
      .join(items.as("c"), col("a.b") === col("c.b") &&
        col("a.i") < col("c.i"))
      .groupBy(col("a.i").as("item_a"), col("c.i").as("item_b"))
      .agg(count(lit(1)).as("pair_baskets"))
      .filter(col("pair_baskets") >= minPairBaskets)
      .join(itemN.select(col("i").as("item_a"), col("__in").as("__an")),
        Seq("item_a"))
      .join(itemN.select(col("i").as("item_b"), col("__in").as("__cn")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("pair_baskets"),
        col("__an").as("a_baskets"), col("__cn").as("b_baskets"),
        round(col("pair_baskets").cast("double") /
          (sqrt(col("__an").cast("double")) *
            sqrt(col("__cn").cast("double"))), 6).as("cosine"))
  }

  /** Dense zero-filled per-key bucket series: exact DECIMAL(18,2)
    * per-bucket sums on the key's min..max grid (missing buckets are
    * REAL zeros — silence is data for autocorrelation and seasonality,
    * unlike [[gapFill]]'s carry-forward view). Shares gapFill's bucket
    * arithmetic and the maxBucketsPerKey raise guard. */
  private def denseSeries(events: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, stepSeconds: Long,
      maxBucketsPerKey: Long): DataFrame = {
    val bucket = floor(unix_timestamp(col(tsCol)).cast("double") /
      lit(stepSeconds.toDouble)).cast("long") * stepSeconds
    val observed = events
      .select(col(keyCol).as("g"), bucket.as("b"),
        col(valueCol).cast("decimal(14,2)").as("__v"))
      .groupBy("g", "b")
      .agg(sum(col("__v")).cast("decimal(18,2)").as("__vo"))
    val spans = observed.groupBy("g")
      .agg(min(col("b")).as("__lo"), max(col("b")).as("__hi"))
      .withColumn("__nb",
        (col("__hi") - col("__lo")) / lit(stepSeconds) + 1L)
      .withColumn("__lo", when(col("__nb") <= maxBucketsPerKey,
        col("__lo"))
        .otherwise(raise_error(concat(lit("denseSeries: key "),
          col("g").cast("string"), lit(" spans "),
          col("__nb").cast("string"),
          lit(" buckets > maxBucketsPerKey")))))
    spans.select(col("g"),
        explode(sequence(col("__lo"), col("__hi"),
          lit(stepSeconds))).as("b"))
      .join(observed, Seq("g", "b"), "left")
      .withColumn("x",
        coalesce(col("__vo"), lit(0).cast("decimal(18,2)")))
      .select("g", "b", "x")
  }

  /** Lag-k autocorrelation (sample ACF) of the per-key bucket series —
    * the periodicity/persistence diagnostic of an event stream ("does
    * yesterday predict today? is there a weekly cycle?" — the ACF at
    * lag 7 spiking IS the weekly seasonality [[seasonalProfile]]
    * quantifies). Convention pinned: Pearson over the overlapping
    * (x_t, x_{t+k}) pairs of the DENSE zero-filled series, per-lag
    * means (the "correlogram of pairs" form — not the
    * constant-global-mean estimator; both are standard, one is pinned).
    *
    * Exactness: series values are exact DECIMAL(18,2) bucket sums, all
    * five moments are exact DECIMAL(38,4) sums over the pair frame, r
    * is the [[graft.ops.Stats.corrMatrix]] fixed-parenthesization IEEE
    * expression, 6-dp; EVERY requested lag emits a row per key (the
    * pair moments left-join a dense (key, lag) grid): lags with no
    * overlapping pairs carry n_pairs = 0, and degenerate lags (fewer
    * than 2 pairs or zero variance on either side) null the acf.
    *
    * Shape: raw rows shuffle ONCE into (key, bucket) sums; the lag
    * expansion explodes a LITERAL lag list over the bucket-domain
    * summary frame and self-joins it on (key, bucket+lag·step) — one
    * summary-frame join, one (key, lag) aggregate; nothing rescans raw
    * rows. */
  def autocorr(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepSeconds: Long, lags: Seq[Int],
      maxBucketsPerKey: Long = 1000000L): DataFrame = {
    require(stepSeconds >= 1, s"stepSeconds must be >= 1, got $stepSeconds")
    require(lags.nonEmpty && lags.forall(_ >= 1),
      s"lags must be >= 1, got $lags")
    require(lags.distinct.size == lags.size, s"duplicate lags: $lags")
    val series = denseSeries(events, keyCol, tsCol, valueCol,
      stepSeconds, maxBucketsPerKey)
    val target = series.select(col("g").as("__tg"), col("b").as("__tb"),
      col("x").as("y"))
    // dense (key, lag) grid: a lag whose shift empties the overlap
    // still owes a row (n_pairs = 0, null acf) — consumers iterate the
    // requested lag list, not the surviving one
    val grid = series.select(col("g")).distinct()
      .withColumn("lag", explode(array(lags.map(l => lit(l)): _*)))
    val pairs = series
      .withColumn("lag", explode(array(lags.map(l => lit(l)): _*)))
      .join(target, col("g") === col("__tg") &&
        col("__tb") === col("b") + col("lag").cast("long") * stepSeconds)
    val moments = pairs.groupBy("g", "lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).cast("decimal(38,2)").as("__sx"),
        sum(col("y")).cast("decimal(38,2)").as("__sy"),
        sum(col("x") * col("x")).cast("decimal(38,4)").as("__sxx"),
        sum(col("y") * col("y")).cast("decimal(38,4)").as("__syy"),
        sum(col("x") * col("y")).cast("decimal(38,4)").as("__sxy"))
    val n = col("n_pairs").cast("double")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val num = n * d(col("__sxy")) - d(col("__sx")) * d(col("__sy"))
    val denX = n * d(col("__sxx")) - d(col("__sx")) * d(col("__sx"))
    val denY = n * d(col("__syy")) - d(col("__sy")) * d(col("__sy"))
    grid.join(moments, Seq("g", "lag"), "left")
      .withColumn("n_pairs", coalesce(col("n_pairs"), lit(0L)))
      .select(col("g"), col("lag"), col("n_pairs"),
        when(col("n_pairs") >= 2L && denX > 0.0 && denY > 0.0,
          round(num / (sqrt(denX) * sqrt(denY)), 6)).as("acf"))
  }

  /** Periodic (e.g. day-of-week) seasonal profile of the per-key bucket
    * series, with the STL-style SEASONAL STRENGTH summary
    * 1 − SSE_resid/SSE_total (how much of the series' variance the
    * periodic means explain; 0 = no cycle, →1 = the cycle is the
    * signal). Per (key, phase): bucket count, exact mean; the strength
    * repeats on each of the key's rows (the n_base convention).
    *
    *   SSE_total = Σx² − S²/N,   SSE_resid = Σx² − Σ_p S_p²/n_p
    *
    * Exactness: series values exact DECIMAL(18,2) ([[denseSeries]] —
    * zero-filled: an empty Monday is evidence of the cycle, not missing
    * data), Σx/Σx² exact DECIMAL sums; each S_p²/n_p is one
    * fixed-parenthesization double, rounded to 6 dp and quantized to
    * DECIMAL(30,6) so the per-key sum over the phase frame is
    * order-invariant; strength clamps at 0 (sampling noise can push the
    * raw ratio past 1), 6-dp renders; single-bucket keys emit null
    * strength.
    *
    * Shape: one raw-row shuffle into (key, bucket) sums; phase
    * reduction and both SSE terms ride the phase-domain summary frame
    * (≤ period rows per key). */
  def seasonalProfile(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepSeconds: Long, period: Int,
      maxBucketsPerKey: Long = 1000000L): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val series = denseSeries(events, keyCol, tsCol, valueCol,
      stepSeconds, maxBucketsPerKey)
    val phases = series
      // integer bucket index then modulo — Spark's `/` on longs is a
      // DOUBLE division; `div` keeps the phase an exact long
      .withColumn("phase", expr(s"(b div ${stepSeconds}L) % ${period}L"))
      .groupBy("g", "phase")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("x")).cast("decimal(28,2)").as("__sp"),
        sum(col("x") * col("x")).cast("decimal(38,4)").as("__ssp"))
    val tot = Window.partitionBy(col("g"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val phaseTerm = round(d(col("__sp")) * d(col("__sp")) /
      d(col("n_buckets")), 6).cast("decimal(30,6)")
    val withTotals = phases
      .withColumn("__N", sum(col("n_buckets")).over(tot))
      .withColumn("__S", sum(col("__sp")).over(tot).cast("decimal(38,2)"))
      .withColumn("__SS", sum(col("__ssp")).over(tot).cast("decimal(38,4)"))
      .withColumn("__fit", sum(phaseTerm).over(tot))
    val sseTot = d(col("__SS")) - d(col("__S")) * d(col("__S")) / d(col("__N"))
    val sseRes = d(col("__SS")) - d(col("__fit"))
    withTotals.select(col("g"), col("phase"), col("n_buckets"),
      round(d(col("__sp")) / d(col("n_buckets")), 6).as("mean_v"),
      when(sseTot > 0.0,
        round(greatest(lit(1.0) - sseRes / sseTot, lit(0.0)), 6))
        .as("seasonal_strength"))
  }

  /** SEASONALITY-AWARE outlier flags per (key, bucket) — the composition
    * of [[seasonalProfile]] and [[graft.ops.Stats.madOutliers]]: a raw
    * z-score calls every Friday peak an anomaly on a weekly-cyclic
    * series; subtracting the per-phase mean FIRST and flagging on the
    * robust (MAD) z of the RESIDUAL catches "this Friday is unusual for
    * a Friday". Per row: observed x, expected (6-dp phase mean),
    * residual, robust z, flag.
    *
    * Exactness: the dense series is exact DECIMAL(18,2) ([[denseSeries]]);
    * expected rounds at 6 dp; the residual rounds at 6 dp; medians are
    * PICKED existing values (the madOutliers discipline — never
    * interpolated), rz rounds at 6 dp and the flag compares rounded
    * values.
    *
    * Shape: one raw-row shuffle into (key, bucket) sums; phase means on
    * the ≤period-row phase frame; the MAD medians ride value-domain
    * cumulative windows (bounded by distinct residuals); everything
    * joins back on (key, bucket). */
  def seasonalOutliers(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepSeconds: Long, period: Int,
      zThresh: Double = 3.5,
      maxBucketsPerKey: Long = 1000000L): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val series = denseSeries(events, keyCol, tsCol, valueCol,
      stepSeconds, maxBucketsPerKey)
    val phases = series
      .withColumn("phase", expr(s"(b div ${stepSeconds}L) % ${period}L"))
      .groupBy("g", "phase")
      .agg(count(lit(1)).as("__n"),
        sum(col("x")).cast("decimal(28,2)").as("__sp"))
      .withColumn("expected",
        round(col("__sp").cast("double") / col("__n").cast("double"), 6))
      .select("g", "phase", "expected")
    val resid = series
      .withColumn("phase", expr(s"(b div ${stepSeconds}L) % ${period}L"))
      .join(phases, Seq("g", "phase"))
      .withColumn("x", col("x").cast("double"))
      .withColumn("resid", round(col("x") - col("expected"), 6))
    val flags = graft.ops.Stats.madOutliers(
      resid.select(col("g").as("__sk"), col("b"), col("resid")),
      "b", "resid", "__sk", zThresh)
      .select(col("__sk").as("g"), col("b"), col("med"), col("mad"),
        col("rz"), col("is_outlier"))
    resid.select("g", "b", "x", "expected", "resid")
      .join(flags, Seq("g", "b"))
      .select("g", "b", "x", "expected", "resid", "med", "mad", "rz",
        "is_outlier")
  }

  /** THEIL–SEN robust trend per key — the median of all pairwise bucket
    * slopes over the dense zero-filled series: one wild day drags an
    * OLS line ([[graft.ops.Stats.linearFit]]); the pairwise-slope
    * median shrugs off up to ~29% corrupted points (its breakdown
    * point), which is what an alerting threshold should sit on.
    * Slope is per BUCKET STEP (multiply by steps/day yourself).
    *
    * Exactness: pairwise slopes are single IEEE divisions of exact
    * DECIMAL(18,2) value differences by exact integer step gaps —
    * identical doubles in both engines — and the median PICKS an
    * existing slope (lower median, the [[graft.ops.Stats.madOutliers]]
    * discipline), 6-dp render.
    *
    * Shape: one raw-row shuffle into the dense series; the pair
    * generator self-joins the BUCKET-DOMAIN summary frame (quadratic
    * in buckets per key — that is the estimator; `maxBucketsPerKey`
    * bounds it in-plan via [[denseSeries]]'s raise, default 1000 →
    * ≤ ~500k pairs per key), then the median rides a slope-domain
    * cumulative window. */
  def theilSen(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepSeconds: Long,
      maxBucketsPerKey: Long = 1000L): DataFrame = {
    val series = denseSeries(events, keyCol, tsCol, valueCol,
      stepSeconds, maxBucketsPerKey)
      .withColumn("i", expr(s"b div ${stepSeconds}L"))
    val pairs = series.select(col("g"), col("i").as("__i1"),
        col("x").as("__x1"))
      .join(series.select(col("g"), col("i").as("__i2"),
        col("x").as("__x2")), Seq("g"))
      .filter(col("__i2") > col("__i1"))
      .select(col("g"),
        ((col("__x2") - col("__x1")).cast("double") /
          (col("__i2") - col("__i1")).cast("double")).as("s"))
    val w = Window.partitionBy(col("g")).orderBy(col("s"))
    val med = pairs.groupBy("g", "s").agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n",
        max(col("__cum")).over(Window.partitionBy(col("g"))))
      .filter(col("__cum") * 2 >= col("__n"))
      .groupBy("g").agg(min(col("s")).as("__med"),
        max(col("__n")).as("n_pairs"))
    val nb = series.groupBy("g").agg(count(lit(1)).as("n_buckets"))
    nb.join(med, Seq("g"), "left")
      .select(col("g"), col("n_buckets"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        round(col("__med"), 6).as("ts_slope"))
  }

  /** Rolling ACTIVE-USER counts over the dense day grid — DAU / WAU /
    * MAU and the DAU/MAU stickiness ratio, the product-health readout
    * every event pipeline reports: for each day in the observed
    * [min, max] grid, the count of distinct users active that day /
    * in the trailing `shortWindow` days / in the trailing `longWindow`
    * days. Gap days emit zeros (and whatever is still active in their
    * trailing windows) — silence is data.
    *
    * Scale shape: raw events collapse ONCE to distinct (user, day)
    * cells; each cell then explodes into the ≤ `longWindow` target days
    * it serves (work = longWindow × cells — linear, bounded by the
    * window constant, never quadratic), and ONE aggregation takes the
    * three conditional distinct counts (Spark plans multi-distinct via
    * Expand: ×3 the contribution rows, still linear). The day grid
    * rides a broadcast 1-row bounds frame. Counts are exact longs;
    * stickiness is one 6-dp division.
    *
    * NULL users are FILTERED explicitly (an anonymous blob would
    * inflate every distinct-count as one phantom user; round-15
    * null-key sweep, documented contract). */
  def activeUsers(events: DataFrame, userCol: String, tsCol: String,
      stepSeconds: Long = 86400L, shortWindow: Int = 7,
      longWindow: Int = 28): DataFrame = {
    require(stepSeconds >= 1, s"stepSeconds must be >= 1, got $stepSeconds")
    require(shortWindow >= 1 && shortWindow <= longWindow,
      s"need 1 <= shortWindow <= longWindow, got $shortWindow/$longWindow")
    require(longWindow <= 366,
      s"longWindow must be <= 366 (work is longWindow x cells), got $longWindow")
    val day = floor(unix_timestamp(col(tsCol)).cast("double") /
      lit(stepSeconds.toDouble)).cast("long")
    // materialize the distinct cell frame once: bounds, the window
    // explode, and the grid all consume it, and without the lineage cut
    // the raw events scan runs once per consumer
    val cells = Dedup.materializeBase(
      events.filter(col(userCol).isNotNull)
        .select(col(userCol).as("u"), day.as("d")).distinct(),
      None)
    val bounds = cells.agg(min(col("d")).as("__lo"), max(col("d")).as("__hi"))
    val contrib = cells
      .withColumn("k", explode(sequence(lit(0), lit(longWindow - 1))))
      .withColumn("td", col("d") + col("k"))
      .crossJoin(broadcast(bounds))
      .filter(col("td") <= col("__hi"))
    val counts = contrib.groupBy(col("td").as("d"))
      .agg(count_distinct(when(col("k") === 0, col("u"))).as("dau"),
        count_distinct(when(col("k") < shortWindow, col("u"))).as("wau"),
        count_distinct(col("u")).as("mau"))
    bounds.select(explode(sequence(col("__lo"), col("__hi"))).as("d"))
      .join(counts, Seq("d"), "left")
      .select(col("d"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"),
        coalesce(col("mau"), lit(0L)).as("mau"))
      .withColumn("stickiness", when(col("mau") > 0L,
        round(col("dau").cast("double") / col("mau").cast("double"), 6)))
  }

  /** Top-k EVENT-PATH trigrams — the "what do users actually DO"
    * sequence-mining readout beside [[eventTransitions]]' first-order
    * matrix (a Markov matrix cannot distinguish view→click→purchase
    * from view→click→error; the trigram table can, and it is the
    * standard input to funnel DISCOVERY — which funnels exist — where
    * [[funnel]] measures one you already know): per (user, bucket)
    * ordered by (ts, tie), each row and its next two events form a
    * path; paths count globally and the top `k` rank by (count desc,
    * path asc).
    *
    * Convention pinned: paths are mined WITHIN a time bucket (default
    * 1 day) — the [[eventTransitions]] bucketed-window discipline, so
    * no task ever holds a user's full history, at the cost of dropping
    * the ≤2 trigrams straddling each bucket edge (documented; at
    * production bucket sizes the loss is noise). Counts are exact; the
    * final rank window rides the path-domain frame (≤ |event types|³
    * rows). */
  def pathTrigrams(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, k: Int = 25,
      stepSeconds: Long = 86400L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val bucket = floor(unix_timestamp(col(tsCol)).cast("double") /
      lit(stepSeconds.toDouble)).cast("long")
    val base = events.select(col(userCol).as("__u"),
      col(tsCol).as("__t"), col(tieCol).as("__tie"),
      col(typeCol).as("__e"), bucket.as("__b"))
    val w = Window.partitionBy(col("__u"), col("__b"))
      .orderBy(col("__t"), col("__tie"))
    val paths = base
      .withColumn("__e2", lead(col("__e"), 1).over(w))
      .withColumn("__e3", lead(col("__e"), 2).over(w))
      .filter(col("__e").isNotNull && col("__e2").isNotNull &&
        col("__e3").isNotNull)
      .select(concat_ws(">", col("__e"), col("__e2"), col("__e3"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
    val wr = Window.orderBy(col("n").desc, col("path"))
    paths.withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("rank"), col("path"), col("n"))
  }

  /** EWMA smoothing of the per-key bucket series — the lag-free trend
    * line every operational dashboard wants beside [[cusumDrift]]'s
    * change flags (a moving average needs a full window in memory and
    * lags by half of it; the exponentially weighted form carries ONE
    * number of state and reacts immediately): over the DENSE
    * zero-filled series (silence is data — the [[gapFill]] grid),
    *
    *   e₀ = x₀,   eᵢ = round(α·xᵢ + (1−α)·eᵢ₋₁, 6)
    *
    * with α quantized to 3 dp and the recursion run ENTIRELY in exact
    * DECIMAL arithmetic with a 6-dp HALF_UP round at every step — the
    * one discipline that makes a sequential recursion bit-replicable by
    * the oracle's recursive CTE (an unrounded float recursion drifts by
    * accumulated ulps; per-step decimal rounding pins every state).
    * Also emits the residual xᵢ − eᵢ (exact decimal subtraction).
    *
    * Scale shape: one raw-row shuffle into the dense series, then each
    * key's series folds in ONE `aggregate` lambda over its collected
    * bucket array — per-key state is the array, bounded in-plan by
    * `maxBucketsPerKey` (the [[autocorr]]/[[theilSen]] cap; the
    * recursion is inherently sequential per key, so the bound IS the
    * contract), parallel across keys. */
  def ewma(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepSeconds: Long, alpha: Double = 0.3,
      maxBucketsPerKey: Long = 10000L): DataFrame = {
    val a = BigDecimal(alpha).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    require(a > 0 && a < 1, s"alpha must be in (0,1) at 3 dp, got $alpha")
    val b1 = BigDecimal(1) - a
    val ser = denseSeries(events, keyCol, tsCol, valueCol, stepSeconds,
      maxBucketsPerKey)
    val arr = ser.groupBy("g")
      .agg(sort_array(collect_list(struct(col("b"), col("x")))).as("__s"))
    val eExpr =
      s"""aggregate(
         |  slice(__s, 2, greatest(size(__s) - 1, 0)),
         |  array(CAST(element_at(__s, 1).x AS DECIMAL(18,6))),
         |  (acc, el) -> array_append(acc,
         |    CAST(round(CAST($a AS DECIMAL(4,3)) * el.x
         |      + CAST($b1 AS DECIMAL(4,3)) * element_at(acc, -1), 6)
         |      AS DECIMAL(18,6))))""".stripMargin
    arr
      .withColumn("__e", expr(eExpr))
      .select(col("g"), posexplode(col("__s")), col("__e"))
      .select(col("g"), col("col.b").as("b"),
        col("col.x").cast("double").as("x"),
        element_at(col("__e"), col("pos") + 1).cast("double").as("ewma"),
        (col("col.x") - element_at(col("__e"), col("pos") + 1))
          .cast("double").as("residual"))
  }

  /** HOLT double-exponential smoothing (level + trend) per key — the
    * short-horizon forecaster beside [[ewma]] (EWMA permanently LAGS a
    * trending series by (1−α)/α steps; Holt carries an explicit trend
    * state and doesn't), over the same dense zero-filled series:
    *
    *   l₀ = x₀, t₀ = 0   (init pinned — the zero-trend convention)
    *   lᵢ = round(α·xᵢ + (1−α)·(lᵢ₋₁ + tᵢ₋₁), 6)
    *   tᵢ = round(β·(lᵢ − lᵢ₋₁) + (1−β)·tᵢ₋₁, 6)
    *
    * and the one-step-ahead forecast lᵢ + tᵢ (exact decimal add). Same
    * cross-engine recursion discipline as [[ewma]]: α/β at 3 dp, every
    * state step exact DECIMAL with a 6-dp HALF_UP round, replayed by
    * the oracle's recursive CTE; same bounded per-key `aggregate` fold
    * (state = the two running arrays), `maxBucketsPerKey` in-plan. */
  def holtLinear(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepSeconds: Long, alpha: Double = 0.3,
      beta: Double = 0.1, maxBucketsPerKey: Long = 10000L): DataFrame = {
    val a = BigDecimal(alpha).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val bb = BigDecimal(beta).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    require(a > 0 && a < 1, s"alpha must be in (0,1) at 3 dp, got $alpha")
    require(bb > 0 && bb < 1, s"beta must be in (0,1) at 3 dp, got $beta")
    val a1 = BigDecimal(1) - a
    val b1 = BigDecimal(1) - bb
    val ser = denseSeries(events, keyCol, tsCol, valueCol, stepSeconds,
      maxBucketsPerKey)
    val arr = ser.groupBy("g")
      .agg(sort_array(collect_list(struct(col("b"), col("x")))).as("__s"))
    // state: struct of the level and trend arrays, folded in lockstep
    val stExpr =
      s"""aggregate(
         |  slice(__s, 2, greatest(size(__s) - 1, 0)),
         |  named_struct(
         |    'l', array(CAST(element_at(__s, 1).x AS DECIMAL(18,6))),
         |    't', array(CAST(0 AS DECIMAL(18,6)))),
         |  (acc, el) -> named_struct(
         |    'l', array_append(acc.l,
         |      CAST(round(CAST($a AS DECIMAL(4,3)) * el.x
         |        + CAST($a1 AS DECIMAL(4,3))
         |          * (element_at(acc.l, -1) + element_at(acc.t, -1)), 6)
         |        AS DECIMAL(18,6))),
         |    't', array_append(acc.t,
         |      CAST(round(CAST($bb AS DECIMAL(4,3))
         |        * (CAST(round(CAST($a AS DECIMAL(4,3)) * el.x
         |            + CAST($a1 AS DECIMAL(4,3))
         |              * (element_at(acc.l, -1) + element_at(acc.t, -1)),
         |            6) AS DECIMAL(18,6)) - element_at(acc.l, -1))
         |        + CAST($b1 AS DECIMAL(4,3)) * element_at(acc.t, -1), 6)
         |        AS DECIMAL(18,6)))))""".stripMargin
    arr
      .withColumn("__st", expr(stExpr))
      .select(col("g"), posexplode(col("__s")), col("__st"))
      .select(col("g"), col("col.b").as("b"),
        col("col.x").cast("double").as("x"),
        element_at(col("__st.l"), col("pos") + 1).cast("double")
          .as("level"),
        element_at(col("__st.t"), col("pos") + 1).cast("double")
          .as("trend"),
        (element_at(col("__st.l"), col("pos") + 1) +
          element_at(col("__st.t"), col("pos") + 1)).cast("double")
          .as("forecast"))
  }

  /** The four compiled constants of a Bernoulli SPRT, rounded to 12 dp
    * so the operator and the oracle share them TEXTUALLY (the
    * dcgDiscounts discipline): per-success and per-failure log-likelihood
    * increments, and the accept-H1 / accept-H0 thresholds. */
  def sprtConstants(p0: Double, p1: Double, alpha: Double,
      beta: Double): (Double, Double, Double, Double) = {
    require(p0 > 0.0 && p1 < 1.0 && p0 < p1,
      s"need 0 < p0 < p1 < 1, got $p0/$p1")
    require(alpha > 0.0 && alpha < 1.0 && beta > 0.0 && beta < 1.0,
      s"need alpha, beta in (0,1), got $alpha/$beta")
    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    (r12(math.log(p1 / p0)),
      r12(math.log((1.0 - p1) / (1.0 - p0))),
      r12(math.log((1.0 - beta) / alpha)),
      r12(math.log(beta / (1.0 - alpha))))
  }

  /** Wald's SEQUENTIAL probability ratio test per group — the
    * early-stopping experiment monitor ("stop the rollout the moment the
    * evidence is in" — a fixed-horizon test both wastes samples on clear
    * winners and invites invalid peeking): each group's events are
    * replayed in (ts, id) order accumulating the Bernoulli log-likelihood
    * ratio LLR_t = k_t·ln(p1/p0) + (t−k_t)·ln((1−p1)/(1−p0)); the test
    * DECIDES at the first t where LLR ≥ ln((1−β)/α) (accept H1: rate is
    * p1) or LLR ≤ ln(β/(1−α)) (accept H0: rate is p0), else `continue`.
    *
    * Determinism/exactness: the replay order is the TOTAL order
    * (ts, id) — `idCol` must be unique within (group, ts); LLR is an
    * exact-integer combination k·c1 + (t−k)·c0 of the two 12-dp compiled
    * constants ([[sprtConstants]], shared textually with the oracle),
    * rounded to 9 dp before every threshold comparison so both engines
    * cross on the same row; 6-dp renders.
    *
    * Scale shape: the prefix counts come from [[Pipeline.runningSum]] —
    * per-(group, bucket) windows plus a broadcast offset scan, NEVER one
    * task per group (an experiment's whole history on one core is the
    * straggler shape this house rejects); the crossing argmin and the
    * final-row readout are two map-combinable struct-min/max
    * aggregations of the scored frame, which is materialized once for
    * its two consumers. */
  def sprt(events: DataFrame, groupCol: String, tsCol: String,
      idCol: String, success: Column, p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.05,
      buckets: Int = 32): DataFrame = {
    val (c1, c0, thrA, thrB) = sprtConstants(p0, p1, alpha, beta)
    val base = events
      .select(col(groupCol).as("g"), col(tsCol).as("__ts"),
        col(idCol).as("__id"),
        when(success, 1L).otherwise(0L).as("__s"))
      .filter(col("__ts").isNotNull && col("__id").isNotNull)
    val withT = Pipeline.runningSum(base, "__ts", lit(1L), "__t",
      buckets, partCols = Seq("g"), tieCols = Seq("__id"))
    val scored = Dedup.materializeBase(
      Pipeline.runningSum(withT, "__ts", col("__s"), "__k",
        buckets, partCols = Seq("g"), tieCols = Seq("__id"))
        .withColumn("__llr", round(
          col("__k").cast("double") * lit(c1) +
            (col("__t") - col("__k")).cast("double") * lit(c0), 9))
        .withColumn("__code",
          when(col("__llr") >= lit(thrA), 1L)
            .when(col("__llr") <= lit(thrB), 0L)),
      None)
    val finals = scored.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(col("__s")).as("successes"),
      max(struct(col("__t"), col("__llr"))).getField("__llr")
        .as("__llr_final"))
    val crossing = scored.filter(col("__code").isNotNull)
      .groupBy("g").agg(
        min(struct(col("__t"), col("__code"), col("__llr"))).as("__f"))
      .select(col("g"), col("__f.__t").as("n_decision"),
        col("__f.__code").as("__dcode"),
        col("__f.__llr").as("__llr_dec"))
    finals.join(crossing, Seq("g"), "left")
      .select(col("g"), col("n"), col("successes"),
        round(col("__llr_final"), 6).as("llr_final"),
        when(col("__dcode") === 1L, lit("accept_h1"))
          .when(col("__dcode") === 0L, lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"),
        col("n_decision"),
        round(col("__llr_dec"), 6).as("llr_decision"))
  }

  /** Single CHANGE-POINT detection per key (binary segmentation, one
    * split — the Scott–Knott/CUSUM-companion readout): over the dense
    * zero-filled bucket series, the split k maximizing the
    * between-segment sum of squares
    *
    *   gain(k) = S_k²/k + (S_n−S_k)²/(n−k) − S_n²/n
    *
    * (= the SSE reduction of a mean-shift model at k), with
    * `mean_before`/`mean_after`, the raw gain, and `score` = gain/SST —
    * the R²-like share of variance one break explains. [[cusumDrift]]
    * flags WHEN a drift alarm fires sequentially; this answers the
    * retrospective "where did the level shift, and how big was it?".
    * Both segments must hold ≥ `minSegment` buckets; keys with fewer
    * than 2·minSegment buckets report null split columns.
    *
    * Determinism/exactness: prefix sums are exact DECIMAL(38,2) over
    * the 2-dp-quantized series, every gain is ONE fixed-parenthesization
    * double chain ROUNDED AT 9 dp BEFORE the argmax (cross-engine
    * ranking compares only quantized values), ties break to the
    * SMALLEST k via lexicographic struct max on (gain₉, −k); 6-dp
    * renders. Shape: one raw-row shuffle into the dense series, windows
    * and the argmax reduction ride the bucket-domain summary frame
    * (≤ maxBucketsPerKey rows per key, in-plan guarded). */
  def changePoint(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepSeconds: Long, minSegment: Int = 2,
      maxBucketsPerKey: Long = 10000L): DataFrame = {
    require(minSegment >= 1, s"minSegment must be >= 1, got $minSegment")
    val ser = denseSeries(events, keyCol, tsCol, valueCol, stepSeconds,
      maxBucketsPerKey)
    val wOrd = Window.partitionBy(col("g")).orderBy(col("b"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val idx = ser
      .withColumn("__i", row_number().over(wOrd).cast("long"))
      .withColumn("__sk", sum(col("x")).over(wCum).cast("decimal(38,2)"))
    val tot = idx.groupBy("g").agg(
      max(col("__i")).as("n_buckets"),
      sum(col("x")).cast("decimal(38,2)").as("__tot"),
      sum((col("x") * col("x")).cast("decimal(38,4)"))
        .cast("decimal(38,4)").as("__ss"))
    def d(c: Column) = c.cast("double")
    val k = d(col("__i"))
    val n = d(col("n_buckets"))
    val sk = d(col("__sk"))
    val sn = d(col("__tot"))
    val gain9 = round(sk * sk / k + (sn - sk) * (sn - sk) / (n - k)
      - sn * sn / n, 9)
    val best = idx.join(tot, Seq("g"))
      .filter(col("__i") >= minSegment.toLong &&
        col("__i") <= col("n_buckets") - minSegment.toLong)
      .withColumn("__g9", gain9)
      .groupBy("g").agg(max(struct(col("__g9"), (-col("__i")).as("__nk"),
        struct(col("__i").as("k"), col("__sk").as("sk"),
          col("b").as("bl")).as("p"))).as("__best"))
    val bk = d(col("__best.p.k"))
    val bsk = d(col("__best.p.sk"))
    val sst = d(col("__ss")) - d(col("__tot")) * d(col("__tot")) / n
    tot.join(best, Seq("g"), "left")
      .select(col("g"), col("n_buckets"),
        (col("__best.p.bl") + lit(stepSeconds)).as("split_b"),
        round(bsk / bk, 6).as("mean_before"),
        round((d(col("__tot")) - bsk) / (n - bk), 6).as("mean_after"),
        round(col("__best.__g9"), 6).as("gain"),
        when(col("__best").isNotNull && sst > 0.0,
          round(col("__best.__g9") / sst, 6)).as("score"))
  }

  /** MULTI-TOUCH ATTRIBUTION credit per channel — the marketing-science
    * readout beside [[funnel]]/[[eventAttribution]] ("which channels
    * drove conversions, under which credit model?"): for every
    * conversion event, its PATH is the user's touch events (types in
    * `touchTypes`) inside the lookback window [conv − W, conv), ranked
    * by (ts, id); the four standard models score each touch —
    * first-touch (rank 1 gets 1), last-touch (rank k gets 1), linear
    * (1/k each), and position-based 40/20/40 (0.4 to each end, 0.2
    * split over the k−2 middles; k = 1 → 1, k = 2 → 0.5/0.5) — and
    * credits sum per channel. Convention pinned: every
    * (conversion, in-window touch) pair participates in that
    * conversion's path — a touch may earn credit toward several
    * conversions (the standard overlapping-window model; dedup to the
    * nearest conversion is a different, also-defensible convention —
    * one is pinned).
    *
    * Exactness: ranks and k are exact integers off one (user,
    * conversion) window family; each credit is one IEEE division
    * rounded at 9 dp and quantized to DECIMAL(18,9) before the
    * per-channel exact sum (order-invariant); 6-dp renders. Shape: one
    * user-keyed join (touches × conversions bounded by per-user
    * activity in the window), one window family on (user, conversion),
    * one channel aggregation. */
  def attributionCredit(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, touchTypes: Seq[String],
      convType: String, windowSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty, "attributionCredit: need touch types")
    require(windowSeconds > 0L,
      s"windowSeconds must be > 0, got $windowSeconds")
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"),
        unix_timestamp(col(tsCol)).as("__cts"), col(idCol).as("__cid"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), col(typeCol).as("channel"),
        unix_timestamp(col(tsCol)).as("__tts"), col(idCol).as("__tid"))
    val paths = touch.join(conv, Seq("__u"))
      .filter(col("__tts") < col("__cts") &&
        col("__tts") >= col("__cts") - lit(windowSeconds))
    val wPath = Window.partitionBy(col("__u"), col("__cid"))
      .orderBy(col("__tts"), col("__tid"))
    val wK = Window.partitionBy(col("__u"), col("__cid"))
    val ranked = paths
      .withColumn("__r", row_number().over(wPath).cast("long"))
      .withColumn("__k", count(lit(1)).over(wK))
    def q9(c: Column) = round(c, 9).cast("decimal(18,9)")
    val kD = col("__k").cast("double")
    val credFirst = when(col("__r") === 1L, lit(1.0)).otherwise(lit(0.0))
    val credLast = when(col("__r") === col("__k"), lit(1.0))
      .otherwise(lit(0.0))
    val credLinear = lit(1.0) / kD
    val credPos = when(col("__k") === 1L, lit(1.0))
      .when(col("__k") === 2L, lit(0.5))
      .when(col("__r") === 1L || col("__r") === col("__k"), lit(0.4))
      .otherwise(lit(0.2) / (kD - lit(2.0)))
    ranked.groupBy(col("channel")).agg(
      count(lit(1)).as("n_touches"),
      countDistinct(col("__u"), col("__cid")).as("n_conversions"),
      round(sum(q9(credFirst)).cast("double"), 6).as("credit_first"),
      round(sum(q9(credLast)).cast("double"), 6).as("credit_last"),
      round(sum(q9(credLinear)).cast("double"), 6).as("credit_linear"),
      round(sum(q9(credPos)).cast("double"), 6).as("credit_position"))
  }
}

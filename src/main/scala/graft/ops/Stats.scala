package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped statistical normalization / outlier operators — the score
  * calibration layer between raw per-document metrics and any
  * threshold-based keep/drop decision. Quality scores, lengths, and
  * perplexities are only comparable across sources after per-source
  * standardization; a global threshold over raw values silently filters
  * whole sources (SURVEY.md §2.11 L93–L94).
  *
  * Scale discipline: moments are map-combinable DECIMAL sums (one
  * shuffle on the group key, group count rows out), broadcast back onto
  * a zero-shuffle scoring scan — the winsorize/perplexity-buckets shape.
  * Rank normalization is the one genuinely window-bound op (a
  * per-group sort is the semantics), partitioned on the group key so a
  * group costs its own sort, never the corpus.
  */
object Stats {

  /** Per-group z-scores with |z| > `zThresh` anomaly flags. Moments come
    * from exact DECIMAL sums (n, Σv, Σv² — map-combinable, one shuffle);
    * mean/std are then fixed-parenthesization IEEE:
    * mean = s/n, var = (ss − s·s/n)/(n−1), z = (v − mean)/std,
    * rendered at 6 dp. The anomaly DECISION uses the rounded z (the
    * house cross-engine discipline: never let a 1-ulp drift flip a
    * boundary row between engines). Groups with n < 2 or zero variance
    * emit null z and false flags.
    *
    * Input values are quantized to DECIMAL(14,2) on entry (the corpus
    * metric columns are 2-dp or integer already); sums use DECIMAL(28,2)
    * / DECIMAL(38,4) headroom — overflow raises, never wraps. */
  def zscoreFlags(df: DataFrame, idCol: String, valueCol: String,
      groupCol: String, zThresh: Double = 3.0): DataFrame = {
    require(zThresh > 0.0, s"zThresh must be > 0, got $zThresh")
    val vq = col(valueCol).cast("decimal(14,2)")
    val moments = df
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__n"),
        sum(vq).cast("decimal(28,2)").as("__s"),
        sum(vq * vq).cast("decimal(38,4)").as("__ss"))
      .withColumn("__mean", col("__s").cast("double") / col("__n"))
      .withColumn("__var", when(col("__n") >= 2,
        (col("__ss").cast("double") -
          col("__s").cast("double") * col("__s").cast("double") / col("__n"))
          / (col("__n") - 1)))
      .withColumn("__std", when(col("__var") > 0.0, sqrt(col("__var"))))
    df.select(col(idCol), col(groupCol), vq.as("v"))
      .join(broadcast(moments), col(groupCol) === col("__g"))
      .withColumn("mean", round(col("__mean"), 6))
      .withColumn("z", round((col("v").cast("double") - col("__mean")) /
        col("__std"), 6))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > zThresh, lit(false)))
      // v renders as DOUBLE: a decimal column stringifies "157.00" vs
      // the oracle's float "157.0" under the driver's hash compare
      .withColumn("v", col("v").cast("double"))
      .select(idCol, groupCol, "v", "mean", "z", "is_anomaly")
  }

  /** Per-group percent-rank normalization — maps each value onto [0, 1]
    * by its rank within the group ((rank − 1)/(n − 1), ties share the
    * rank), the distribution-free calibration that makes thresholds
    * comparable across sources with wildly different scales. Singleton
    * groups get 0.0 (both engines' percent_rank convention). Identical
    * output to `percent_rank() OVER (PARTITION BY group ORDER BY value)`.
    *
    * NOT the naive window: that sorts each whole group inside one task,
    * so a handful of big sources serializes the corpus. Instead the rank
    * is derived from per-(group, value) COUNTS — rank(v) = 1 + count of
    * group rows below v — via a running sum over each group's distinct-
    * value SUMMARIES (the eventTransitions bucket-summary discipline:
    * the only windowed frame is distinct-values-sized, bounded by the
    * value domain, never the row count), joined back on (group, value).
    * Exact integer rank arithmetic, one IEEE division, 9-dp render. */
  def percentRankNormalize(df: DataFrame, idCol: String, valueCol: String,
      groupCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val ranks = df
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__rank", col("__cum") - col("__c") + 1L)
    val totals = Window.partitionBy(col(groupCol))
    val withN = ranks.withColumn("__n", max(col("__cum")).over(totals))
      .select(col(groupCol), col(valueCol), col("__rank"),
        when(col("__n") > 1L,
          round((col("__rank") - 1L).cast("double") / (col("__n") - 1L), 9))
          .otherwise(lit(0.0)).as("pr"))
      .drop("__rank")
    // <=> (null-safe), not a USING join: null values and null groups are
    // real rows — a null-unsafe equijoin would silently drop them. The
    // null-rank convention is Spark's window convention (ascending order
    // ranks nulls FIRST — the summary row for the null value sorts first
    // in `w`, so percent_rank(null) = 0 when present), keeping the
    // "identical output to percent_rank() OVER (...)" claim true for
    // null-bearing inputs too. (DuckDB defaults to NULLS LAST; the gate's
    // columns are non-null so the oracle never sees the difference.)
    val keyed = withN
      .withColumnRenamed(groupCol, "__jg")
      .withColumnRenamed(valueCol, "__jv")
    df.select(col(idCol), col(groupCol), col(valueCol))
      .join(keyed, col(groupCol) <=> col("__jg") &&
        col(valueCol) <=> col("__jv"))
      .select(col(idCol), col(groupCol), col(valueCol), col("pr"))
  }

  /** Fixed-width per-group histogram over [lo, hi): bin k covers
    * [lo + k·w, lo + (k+1)·w) with w = (hi − lo)/bins; values at exactly
    * `hi` close the last bin, values outside [lo, hi] are dropped (the
    * caller clips first — [[graft.ops.TextAnalysis.winsorize]] — if they
    * must count). Empty bins emit with n = 0 (a dashboard histogram with
    * holes is a bug); the dense (group, bin) grid is an in-plan
    * sequence-explode over the group list, never a driver loop.
    *
    * Bin arithmetic: k = floor((v − lo)·bins/(hi − lo)) — one
    * correctly-rounded multiply + divide on exact inputs, identical in
    * any IEEE engine; floor (not cast) for the truncate-vs-round
    * cast divergence. One (group, bin) shuffle, map-combinable. */
  def histogram(df: DataFrame, valueCol: String, groupCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi]")
    val v = col(valueCol).cast("double")
    // least(): for v just below hi, (v−lo)·bins/(hi−lo) can round UP to
    // exactly `bins` under IEEE rounding (e.g. lo=0, hi=3·2⁻⁵³·3…), and
    // an unclamped bin==bins would fall off the dense grid and silently
    // vanish from the left join — violating the "values in [lo, hi] are
    // counted" contract. The clamp is mirrored in the q_histogram oracle.
    val bin = when(v === hi, lit(bins - 1)).otherwise(least(
      floor((v - lit(lo)) * lit(bins.toDouble) / lit(hi - lo)).cast("int"),
      lit(bins - 1)))
    val counts = df
      .filter(v >= lo && v <= hi)
      .select(col(groupCol).as("g"), bin.as("bin"))
      .groupBy("g", "bin").agg(count(lit(1)).as("n"))
    val grid = df.select(col(groupCol).as("g")).distinct()
      .select(col("g"), explode(sequence(lit(0), lit(bins - 1))).as("bin"))
    grid.join(counts, Seq("g", "bin"), "left")
      .select(col("g"), col("bin"),
        round(lit(lo) + col("bin") * (lit(hi - lo) / lit(bins.toDouble)), 6)
          .as("bin_lo"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** 2-D HISTOGRAM per group — the joint-distribution readout behind
    * every density heatmap and the drift check a 1-D histogram can't
    * see (two marginals can both hold still while the joint rotates):
    * fixed-width bins on both axes (the [[histogram]] clamped-edge
    * arithmetic on each), one row per OBSERVED (group, bx, by) cell
    * with count and 6-dp share of the group's in-range mass. Sparse by
    * design — a dense xBins×yBins grid per group is quadratic in the
    * bin constants and all-zero cells say nothing a consumer can't
    * infer; the observed-cell frame is what scales.
    *
    * ONE map-combinable (group, bx, by) shuffle; the share divides by a
    * group-total window over the cell frame. */
  def histogram2d(df: DataFrame, xCol: String, yCol: String,
      groupCol: String, xLo: Double, xHi: Double, xBins: Int,
      yLo: Double, yHi: Double, yBins: Int): DataFrame = {
    require(xBins >= 1 && yBins >= 1,
      s"bins must be >= 1, got $xBins x $yBins")
    require(xLo < xHi && yLo < yHi,
      s"need lo < hi on both axes, got [$xLo,$xHi] x [$yLo,$yHi]")
    def binOf(c: Column, lo: Double, hi: Double, bins: Int): Column =
      when(c === hi, lit(bins - 1)).otherwise(least(
        floor((c - lit(lo)) * lit(bins.toDouble) / lit(hi - lo)).cast("int"),
        lit(bins - 1)))
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val cells = df
      .filter(x >= xLo && x <= xHi && y >= yLo && y <= yHi)
      .select(col(groupCol).as("g"),
        binOf(x, xLo, xHi, xBins).as("bx"),
        binOf(y, yLo, yHi, yBins).as("by"))
      .groupBy("g", "bx", "by").agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy(col("g"))
    cells
      .withColumn("__t", sum(col("n")).over(tot))
      .select(col("g"), col("bx"), col("by"),
        round(lit(xLo) + col("bx") * (lit(xHi - xLo) / lit(xBins.toDouble)), 6)
          .as("x_lo"),
        round(lit(yLo) + col("by") * (lit(yHi - yLo) / lit(yBins.toDouble)), 6)
          .as("y_lo"),
        col("n"),
        round(col("n").cast("double") / col("__t").cast("double"), 6)
          .as("share"))
  }

  /** JOIN-KEY SKEW PROFILE — the diagnostic a 100 TB pipeline runs
    * BEFORE picking a join strategy (broadcast? salt? AQE skew hints?):
    * one row per profiled key column with row/key counts, the heaviest
    * key and its share, the max/avg skew ratio, picked-value p50/p99
    * per-key counts, and how many keys exceed `hotShare` of the rows.
    * A skew ratio near 1 shuffles clean; a 10⁴ ratio means one task
    * eats the hot key unless it's salted.
    *
    * Exactness: counts exact longs, quantile counts PICKED at ⌈q·n⌉ of
    * the count ECDF (the [[robustScale]] discipline), shares/ratios
    * single 6-dp divisions; the top key reports the lexicographically
    * smallest argmax (deterministic under ties).
    *
    * Shape: one map-combinable key count shuffle; everything else
    * reduces the per-key count frame (aggregates + one cumulative
    * window over the count DOMAIN — bounded by distinct count values,
    * never key count). */
  def skewProfile(df: DataFrame, keyCol: String,
      hotShare: Double = 0.01): DataFrame = {
    require(hotShare > 0.0 && hotShare <= 1.0,
      s"hotShare must be in (0, 1], got $hotShare")
    val counts = df.select(col(keyCol).cast("string").as("k"))
      .groupBy("k").agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum(col("c")).cast("long").as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("c")).as("max_count"))
    // second reduction over the key frame with the 1-row totals
    // broadcast in — never a global window over all keys
    val extras = counts.crossJoin(broadcast(totals)).agg(
      min(when(col("c") === col("max_count"), col("k"))).as("top_key"),
      sum(when(col("c").cast("double") >
          lit(hotShare) * col("n_rows").cast("double"), 1L)
        .otherwise(0L)).as("n_hot_keys"))
    // count-DOMAIN ECDF: the global window runs over distinct count
    // VALUES (bounded far below key count), not keys
    val w = Window.orderBy(col("c"))
    val ecdf = counts.groupBy("c").agg(count(lit(1)).as("m"))
      .withColumn("__cum", sum(col("m")).over(w))
      .withColumn("__n", max(col("__cum")).over(Window.partitionBy()))
    def pick(q: Double, name: String): DataFrame = ecdf
      .filter(col("__cum") >= ceil(lit(q) * col("__n")))
      .agg(min(col("c")).as(name))
    totals
      .crossJoin(broadcast(extras))
      .crossJoin(broadcast(pick(0.5, "p50_count")))
      .crossJoin(broadcast(pick(0.99, "p99_count")))
      .select(lit(keyCol).as("key_col"), col("n_rows"), col("n_keys"),
        col("max_count"), col("top_key"),
        round(col("max_count").cast("double") /
          col("n_rows").cast("double"), 6).as("max_share"),
        round(col("max_count").cast("double") /
          (col("n_rows").cast("double") / col("n_keys").cast("double")),
          6).as("skew_ratio"),
        col("p50_count"), col("p99_count"), col("n_hot_keys"))
  }

  /** DIFFERENTIALLY-PRIVATE group counts (ε-DP Laplace mechanism) —
    * the privacy-preserving release beside [[kAnonymity]]/[[lDiversity]]'s
    * audits: released = n + Laplace(sensitivity/ε), one draw per group.
    * The noise is DETERMINISTIC given (salt, group): the uniform is
    * (md5Long60(group)+0.5)/2⁶⁰ ∈ (0,1) — never rand(), so re-runs,
    * retries, and the oracle agree. NOTE this determinism is a
    * REPRODUCIBILITY seam, not a privacy weakening — one release per
    * (salt, group) is exactly the ε-DP contract; re-releasing under
    * fresh salts composes ε like any repeated query. The true count
    * column is emitted for the engine gate; a production release drops
    * it (and `violates` k-style columns) before publication.
    *
    * Engine-exactness: the inverse-CDF chain
    * −b·sgn(u−½)·ln(1−2|u−½|) runs on identical doubles in both
    * engines; released renders at 6 dp (the ln-libm discipline).
    *
    * ONE map-combinable count shuffle; the noise is a projection. */
  def dpCounts(df: DataFrame, groupCol: String, epsilon: Double,
      sensitivity: Double = 1.0, salt: String = "dp"): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be > 0, got $epsilon")
    require(sensitivity > 0.0, s"sensitivity must be > 0, got $sensitivity")
    val b = sensitivity / epsilon
    val counts = df.select(col(groupCol).cast("string").as("g"))
      .groupBy("g").agg(count(lit(1)).as("n"))
    val u = (Pipeline.md5Long60(col("g"), salt).cast("double") + 0.5) /
      lit(math.pow(2.0, 60))
    val t = u - lit(0.5)
    val noise = lit(-b) * signum(t) * log(lit(1.0) - lit(2.0) * abs(t))
    counts.select(col("g"), col("n"), lit(epsilon).as("epsilon"),
      round(col("n").cast("double") + noise, 6).as("released"))
  }

  /** Per-group ORDINARY-LEAST-SQUARES line fit (slope, intercept, R²) —
    * "is this metric trending, and how fast?": the parametric trend
    * readout beside [[graft.ops.Behavior.cusumDrift]]'s change detector
    * and [[spearmanCorr]]'s direction-only monotone test.
    *
    * Exactness: x and y quantize to DECIMAL(14,2) (the [[corrMatrix]]
    * discipline), all five moments are exact DECIMAL(38,4) sums, and
    * slope/intercept/R² are fixed-parenthesization double chains off
    * the exact moments (the intercept consumes the UNROUNDED slope),
    * 6-dp renders. Zero x-variance groups null everything; R² also
    * needs y-variance.
    *
    * ONE map-combinable moment shuffle; nothing is windowed. */
  def linearFit(df: DataFrame, xCol: String, yCol: String,
      groupCol: String): DataFrame = {
    val base = df
      .select(col(groupCol).as("g"),
        col(xCol).cast("decimal(14,2)").as("x"),
        col(yCol).cast("decimal(14,2)").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val m = base.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("decimal(38,2)").as("__sx"),
      sum(col("y")).cast("decimal(38,2)").as("__sy"),
      sum(col("x") * col("x")).cast("decimal(38,4)").as("__sxx"),
      sum(col("y") * col("y")).cast("decimal(38,4)").as("__syy"),
      sum(col("x") * col("y")).cast("decimal(38,4)").as("__sxy"))
    def d(c: Column) = c.cast("double")
    val n = d(col("n"))
    val num = n * d(col("__sxy")) - d(col("__sx")) * d(col("__sy"))
    val denX = n * d(col("__sxx")) - d(col("__sx")) * d(col("__sx"))
    val denY = n * d(col("__syy")) - d(col("__sy")) * d(col("__sy"))
    val slope = num / denX
    m.select(col("g"), col("n"),
      when(col("n") >= 2L && denX > 0.0, round(slope, 6)).as("slope"),
      when(col("n") >= 2L && denX > 0.0,
        round((d(col("__sy")) - slope * d(col("__sx"))) / n, 6))
        .as("intercept"),
      when(col("n") >= 2L && denX > 0.0 && denY > 0.0,
        round(num * num / (denX * denY), 6)).as("r2"))
  }

  /** TRIMMED mean per group — the outlier-resistant location estimate
    * beside [[graft.ops.TextAnalysis.winsorize]]'s clamping (winsorize
    * KEEPS extreme rows at the cut value; trimming DROPS them — the
    * convention difference that moves reported means): values outside
    * the PICKED [q_lo, q_hi] cut values (⌈q·n⌉ ECDF picks, the
    * [[robustScale]] discipline — never interpolated) are excluded,
    * kept values quantize to DECIMAL(18,6) for an order-invariant sum,
    * one final division, 6-dp.
    *
    * One (group, value) count shuffle + a value-domain window; the cut
    * frame broadcasts back onto a second scan of the SUMMARY frame
    * (counts ride along — raw rows are touched once). */
  def trimmedMean(df: DataFrame, valueCol: String, groupCol: String,
      loQ: Double = 0.05, hiQ: Double = 0.95): DataFrame = {
    require(loQ >= 0.0 && hiQ <= 1.0 && loQ < hiQ,
      s"need 0 <= loQ < hiQ <= 1, got $loQ/$hiQ")
    val counts = df
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("g", "v").agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n",
        max(col("__cum")).over(Window.partitionBy(col("g"))))
    def pick(q: Double, name: String): DataFrame = cum
      .filter(col("__cum") >= greatest(lit(1L),
        ceil(lit(q) * col("__n")).cast("long")))
      .groupBy("g").agg(min(col("v")).as(name))
    cum
      .join(broadcast(pick(loQ, "lo_v")), Seq("g"))
      .join(broadcast(pick(hiQ, "hi_v")), Seq("g"))
      .groupBy("g")
      .agg(max(col("__n")).as("n"),
        sum(when(col("v") >= col("lo_v") && col("v") <= col("hi_v"),
          col("__c")).otherwise(lit(0L))).as("n_kept"),
        max(col("lo_v")).as("lo_v"), max(col("hi_v")).as("hi_v"),
        sum(when(col("v") >= col("lo_v") && col("v") <= col("hi_v"),
          round(col("v"), 6).cast("decimal(18,6)") * col("__c"))
          .otherwise(lit(0).cast("decimal(18,6)")))
          .cast("decimal(38,6)").as("__s"))
      .withColumn("trimmed_mean", when(col("n_kept") > 0L,
        round(col("__s").cast("double") / col("n_kept").cast("double"), 6)))
      .drop("__s")
  }

  /** Per-group MODE (most frequent value), ties to the smallest value —
    * deterministic, partition-invariant. The argmax runs over per-group
    * value SUMMARIES (one (group, value) count aggregation, then a
    * window over rows bounded by the group's distinct-value count — the
    * summary-window discipline), never over raw rows. */
  def modePerGroup(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame = {
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("n_mode"))
    val win = Window.partitionBy(col("g"))
      .orderBy(col("n_mode").desc, col("v").asc)
    counts.withColumn("__rn", row_number().over(win))
      .filter(col("__rn") === 1)
      .select(col("g"), col("v").as("mode_value"), col("n_mode"))
  }

  /** Pairwise Pearson correlation matrix over numeric columns from ONE
    * aggregation job: inputs quantize to DECIMAL(14,2) (the corpus
    * metric columns are 2-dp or integer), all moments (n, Σx, Σx², Σxy)
    * are exact DECIMAL sums, and each r is the textbook fixed-
    * parenthesization IEEE expression
    * (n·Σxy − Σx·Σy) / (sqrt(n·Σx² − Σx²ₛ) · sqrt(n·Σy² − Σy²ₛ))
    * rendered at 6 dp — NOT the engine's corr() (whose accumulation
    * order is engine-private). Zero-variance columns emit null r.
    * Output: one row per unordered pair (col_a < col_b by name). */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix: need at least two columns")
    require(cols.distinct.size == cols.size, "corrMatrix: duplicate columns")
    val sorted = cols.sorted
    def q(c: String) = col(c).cast("decimal(14,2)")
    val aggs = sorted.flatMap { c =>
      Seq(sum(q(c)).cast("decimal(38,2)").as(s"__s_$c"),
        sum(q(c) * q(c)).cast("decimal(38,4)").as(s"__ss_$c"))
    } ++ sorted.combinations(2).map { case Seq(a, b) =>
      sum(q(a) * q(b)).cast("decimal(38,4)").as(s"__sp_${a}_$b")
    } :+ count(lit(1)).as("__n")
    val one = df.na.drop(sorted).agg(aggs.head, aggs.tail: _*)
    val pairs = sorted.combinations(2).toSeq.map { case Seq(a, b) =>
      val n = col("__n").cast("double")
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val num = n * d(col(s"__sp_${a}_$b")) -
        d(col(s"__s_$a")) * d(col(s"__s_$b"))
      def den(c: String) =
        n * d(col(s"__ss_$c")) - d(col(s"__s_$c")) * d(col(s"__s_$c"))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(den(a) > 0.0 && den(b) > 0.0,
          round(num / (sqrt(den(a)) * sqrt(den(b))), 6)).as("r"))
    }
    one.select(explode(array(pairs: _*)).as("p")).select(col("p.*"))
  }

  /** Benford first-significant-digit audit per group — the fabricated-
    * numbers / synthetic-data smell test: observed first-digit fractions
    * vs the Benford expectation log10(1 + 1/d), plus a chi²-style
    * divergence stat per group. The expected fractions are nine COMPILED
    * 9-dp constants (never an in-engine log10 — ln/log10 are not
    * correctly rounded, and constants dodge the whole class of
    * cross-engine ulp flips); observed fractions round to 9 dp before
    * the divergence arithmetic, so every downstream IEEE op sees
    * identical inputs in any engine.
    *
    * First digit extraction is STRING-based (first [1-9] in the decimal
    * render of the DECIMAL(14,2)-quantized value) — no log10/pow floor
    * arithmetic to diverge; zero/null values are excluded (no first
    * significant digit). One narrow scan + one (group, digit) shuffle;
    * the dense 9-digit grid per group explodes in-plan. */
  def benfordAudit(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame = {
    val digit = regexp_extract(abs(col(valueCol).cast("decimal(14,2)"))
      .cast("string"), "[1-9]", 0)
    val counts = df
      .select(col(groupCol).as("g"), digit.as("d"))
      .filter(col("d") =!= "")
      .groupBy("g", "d").agg(count(lit(1)).as("n_obs"))
    val grid = counts.select(col("g")).distinct()
      .select(col("g"), explode(sequence(lit(1), lit(9))).as("dig"))
      .withColumn("d", col("dig").cast("string")).drop("dig")
    val expected = Benford.zipWithIndex.foldRight(
        lit(null).cast("double")) { case ((e, i), acc) =>
      when(col("d") === (i + 1).toString, lit(e)).otherwise(acc)
    }
    val totals = Window.partitionBy(col("g"))
    val dense = grid.join(counts, Seq("g", "d"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("__tot", sum(col("n_obs")).over(totals))
      .withColumn("frac_obs",
        when(col("__tot") > 0, round(col("n_obs").cast("double") /
          col("__tot"), 9)).otherwise(lit(0.0)))
      .withColumn("frac_exp", expected)
      // per-digit divergence term on the ROUNDED fractions, quantized so
      // the per-group sum is order-invariant (the t_entropy discipline)
      .withColumn("__t", ((col("frac_obs") - col("frac_exp")) *
        (col("frac_obs") - col("frac_exp")) / col("frac_exp"))
        .cast("decimal(28,14)"))
      .withColumn("chi2_stat",
        round(sum(col("__t")).over(totals).cast("double"), 6))
    dense.select(col("g"), col("d").cast("int").as("digit"), col("n_obs"),
      col("frac_obs"), col("frac_exp"), col("chi2_stat"))
  }

  /** round(log10(1 + 1/d), 9) for d = 1..9 — compiled constants shared
    * by the operator and (textually) its oracle. */
  val Benford: Seq[Double] =
    (1 to 9).map(d => math.rint(math.log10(1.0 + 1.0 / d) * 1e9) / 1e9)

  /** Contribution-CONCENTRATION report ("the top 1% of users generate
    * X% of events"; on a corpus, "3 domains own half the tokens" — the
    * inequality audit behind per-source caps and dedup priorities):
    * for each requested top-fraction cut, the exact share of total
    * activity owned by the ⌈p·N⌉ most active keys, plus the exact Gini
    * coefficient of the activity distribution.
    *
    * Scale shape: per-key counts (one shuffle), then EVERYTHING runs on
    * the count-VALUE distribution — one row per distinct activity
    * level, bounded by the value range, orders of magnitude below the
    * key count — with running sums over those summaries (the
    * summary-window discipline; the naive global sort of per-key counts
    * plus a one-partition running sum is exactly what this avoids).
    * All sums are DECIMAL(38,0)-exact (key counts × activity values
    * overflow longs at 100 TB); each share/gini is one IEEE division,
    * 9-dp render. Boundary keys inside a tied activity level contribute
    * fractionally by key count (partial-group arithmetic, exact).
    *
    * Gini via the rank formula on tied groups, ascending activity:
    * a group of k keys at level c occupying ranks r0+1..r0+k adds
    * c·(2·r0·k + k·(k+1) − (N+1)·k) — division-free integer form, so
    * every intermediate stays an exact DECIMAL integer; G = Σ / (N·T). */
  def concentrationReport(df: DataFrame, keyCol: String,
      cuts: Seq[Double] = Seq(0.01, 0.1, 0.5)): DataFrame = {
    require(cuts.nonEmpty && cuts.forall(p => p > 0.0 && p <= 1.0),
      s"cuts must be in (0, 1], got $cuts")
    val counts = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
    val dist = counts.groupBy("c")
      .agg(count(lit(1)).cast("decimal(38,0)").as("nk"))
      .withColumn("ev", (col("c").cast("decimal(38,0)") * col("nk"))
        .cast("decimal(38,0)"))
    val desc = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val asc = Window.orderBy(col("c").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one row per distinct activity level: tiny frame, the single-
    // partition windows below are over it, never over keys
    val cum = dist
      .withColumn("cum_k", sum(col("nk")).over(desc).cast("decimal(38,0)"))
      .withColumn("cum_ev", sum(col("ev")).over(desc).cast("decimal(38,0)"))
      .withColumn("cum_k_asc", sum(col("nk")).over(asc).cast("decimal(38,0)"))
    val totals = dist.agg(sum(col("nk")).cast("decimal(38,0)").as("n_keys"),
      sum(col("ev")).cast("decimal(38,0)").as("t_events"))
    // exact Gini from the tied-group rank formula (ascending levels)
    val giniRow = cum.crossJoin(broadcast(totals))
      .withColumn("__r0", (col("cum_k_asc") - col("nk")).cast("decimal(38,0)"))
      .withColumn("__term", (col("c").cast("decimal(38,0)") *
        (lit(2).cast("decimal(38,0)") * col("__r0") * col("nk") +
          col("nk") * (col("nk") + 1) -
          (col("n_keys") + 1) * col("nk"))).cast("decimal(38,0)"))
      .agg((sum(col("__term")).cast("double") /
        (first(col("n_keys")).cast("double") *
          first(col("t_events")).cast("double"))).as("__g"))
      .select(round(col("__g"), 9).as("gini"))
    val cutRows = cuts.sorted.map { p =>
      val kp = ceil(lit(p) * col("n_keys").cast("double"))
        .cast("decimal(38,0)")
      val hit = cum.crossJoin(broadcast(totals))
        .withColumn("__kp", kp)
        .filter(col("cum_k") >= col("__kp"))
        // first level (desc order) reaching the cut = min cum_k
        .agg(min(struct(col("cum_k"), col("c"), col("cum_ev"),
          col("__kp"), col("t_events"))).as("m"))
        .select(lit(p).as("top_fraction"),
          col("m.__kp").cast("long").as("top_keys"),
          round(((col("m.cum_ev") -
            (col("m.cum_k") - col("m.__kp")) * col("m.c")).cast("double")) /
            col("m.t_events").cast("double"), 9).as("events_share"))
      hit
    }
    cutRows.reduce(_ unionByName _).crossJoin(broadcast(giniRow))
  }

  /** k-anonymity audit over quasi-identifier columns — the governance
    * gate before a dataset leaves its enclave: every quasi-identifier
    * combination's group size, flagged when under `k` (those rows are
    * re-identifiable by joining the quasi columns against any public
    * table). One map-combinable groupBy on the quasi tuple; output is
    * combination-count-sized. Null quasi values group as values (null
    * is itself identifying). */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity: need at least one quasi column")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("violates_k", col("n") < k)
  }

  /** l-diversity audit — the companion of [[kAnonymity]] that k alone
    * cannot provide: a quasi-identifier group can be huge yet leak the
    * sensitive attribute completely if every row shares one sensitive
    * value (the homogeneity attack). Per quasi group: row count n
    * (ALL rows, including null-sensitive ones — a privacy audit that
    * silently drops groups understates exposure), DISTINCT NON-NULL
    * sensitive values l, the ENTROPY (bits) of the non-null sensitive
    * distribution (distinct-l says "2 values exist"; entropy says "but
    * 99% is one of them" — entropy l-diversity is the stronger form),
    * and the l < `l` violation flag. A group whose sensitive column is
    * entirely null still surfaces: l_distinct = 0, null entropy,
    * violates_l = true.
    *
    * Engine-exactness: shares round to 9 dp before the ln, −p·ln p
    * terms round to 10 dp and quantize to DECIMAL(28,14)
    * (order-invariant sums), ÷[[Ln2]] compiled, 6-dp render.
    *
    * Shape: ONE map-combinable (quasi…, sensitive) cell shuffle — null
    * sensitive values ride as their own cell so the all-rows total
    * needs no second scan; counts, l, and the entropy sum all reduce
    * the cell frame — raw rows are never windowed. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity: need at least one quasi column")
    require(l >= 1, s"l must be >= 1, got $l")
    val cells = df
      .groupBy((quasiCols.map(col) :+
        col(sensitiveCol).cast("string").as("__sv")): _*)
      .agg(count(lit(1)).as("__c"))
    val tot = Window.partitionBy(quasiCols.map(col): _*)
    cells
      .withColumn("__n", sum(col("__c")).over(tot))
      .withColumn("__nn", sum(when(col("__sv").isNotNull, col("__c"))
        .otherwise(lit(0L))).over(tot))
      .withColumn("__p", when(col("__sv").isNotNull,
        round(col("__c").cast("double") / col("__nn").cast("double"), 9)))
      .groupBy(quasiCols.map(col): _*)
      .agg(max(col("__n")).as("n"),
        count(col("__sv")).as("l_distinct"),
        sum(round(when(col("__p") > 0.0, -col("__p") * log(col("__p")))
          .otherwise(lit(0.0)), 10).cast("decimal(28,14)"))
          .cast("double").as("__h"))
      .withColumn("entropy_bits",
        when(col("l_distinct") > 0L, round(col("__h") / lit(Ln2), 6)))
      .withColumn("violates_l", col("l_distinct") < l)
      .drop("__h")
  }

  /** t-CLOSENESS audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third rung of the privacy ladder after [[kAnonymity]] (group
    * sizes) and [[lDiversity]] (within-group sensitive diversity):
    * a group can be large AND diverse yet still leak ("this ZIP's
    * salaries are all in the top decile"), so per quasi-identifier
    * group this measures the EARTH-MOVER'S DISTANCE between the
    * group's sensitive-value distribution and the WHOLE table's, over
    * the ordered value domain with unit spacing, normalized by (m − 1)
    * — the paper's ordered-attribute EMD, in [0, 1]. `violates_t`
    * flags groups with emd > t.
    *
    * Exactness: every cumulative gap |cumP/n_g − cumQ/N| is computed as
    * the INTEGER |cumP·N − cumQ·n_g| (DECIMAL(38,0) sums), so the sum
    * is exact and the single division by n_g·N·(m−1) happens once at
    * the render edge (9 dp). Null sensitive values are excluded from
    * BOTH distributions (documented: t-closeness is about the value
    * distribution; nulls are [[lDiversity]]'s concern). A one-value
    * domain (m = 1) scores emd = 0.
    *
    * Shape: one map-combinable (quasi…, value) cell shuffle, the
    * global domain frame broadcast (guarded at `maxDomain` distinct
    * values, naming the remediation), per-group windows over m-row
    * grids — bounded by the domain, never by row count. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, t: Double, maxDomain: Int = 10000): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness: need at least one quasi column")
    require(t >= 0 && t <= 1, s"t must be in [0, 1], got $t")
    val s = col(sensitiveCol)
    val whole = Window.partitionBy()
    val cells = df.filter(s.isNotNull)
      .groupBy((quasiCols.map(col) :+ s.as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val gvals = df.filter(s.isNotNull)
      .groupBy(s.as("__v")).agg(count(lit(1)).as("__gc"))
      .withColumn("__m", count(lit(1)).over(whole))
      .withColumn("__N", sum(col("__gc")).over(whole))
      .withColumn("__v", when(col("__m") <= maxDomain, col("__v"))
        .otherwise(raise_error(concat(
          lit("tCloseness: sensitive domain holds "),
          col("__m").cast("string"),
          lit(s" distinct values > maxDomain=$maxDomain — the per-group" +
            " grid is groups × domain; bucket the sensitive attribute" +
            " (histogram bins) or raise maxDomain")))))
    val groups = cells.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).as("__ng"))
    val grid = groups.crossJoin(broadcast(gvals))
      .join(cells, quasiCols :+ "__v", "left")
      .withColumn("__cg", coalesce(col("__c"), lit(0L)))
    val byG = Window.partitionBy(quasiCols.map(col): _*).orderBy(col("__v"))
    val cum = byG.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("__cp", sum(col("__cg")).over(cum))
      .withColumn("__cq", sum(col("__gc")).over(cum))
      .withColumn("__rk", row_number().over(byG))
      .withColumn("__num", when(col("__rk") < col("__m"),
        abs(col("__cp").cast("decimal(38,0)") * col("__N") -
          col("__cq").cast("decimal(38,0)") * col("__ng")))
        .otherwise(lit(0).cast("decimal(38,0)")))
      .groupBy(quasiCols.map(col): _*)
      .agg(max(col("__ng")).as("n"),
        when(max(col("__m")) > 1L,
          round(sum(col("__num")).cast("double") /
            (max(col("__ng")).cast("double") * max(col("__N")).cast("double") *
              (max(col("__m")) - 1L).cast("double")), 9))
          .otherwise(lit(0.0)).as("emd"))
      .withColumn("violates_t", col("emd") > t)
  }

  /** Population-Stability-Index DRIFT between two snapshots of a value
    * distribution, per group — the model-monitoring standard ("did this
    * feature's distribution move since training?"; PSI < 0.1 stable,
    * 0.1–0.25 moderate, > 0.25 action): fixed-width bins over [lo, hi]
    * (the [[histogram]] bin arithmetic, clamped edge bin included),
    * PSI = Σ_bins (p_cur − p_base)·ln(p_cur / p_base) with both shares
    * floored at `minShare` (the standard ε guard — an empty bin is
    * strong evidence, not a division by zero; the floor is for empty
    * bins WITHIN two real samples). A group present in only one
    * snapshot emits null psi — "no verdict", the convention every
    * sibling drift op (ksTwoSample, emdDrift, jsDivergence) follows —
    * never a large finite PSI manufactured from an all-floored side.
    * The DISTRIBUTIONAL complement of
    * [[graft.ops.Behavior.cusumDrift]]'s temporal monitor.
    *
    * Engine-exactness: shares round to 9 dp before the ln (so both
    * engines feed ln the same double), each bin term rounds to 10 dp
    * and quantizes to DECIMAL(28,14) so the per-group sum is
    * order-invariant (the benfordAudit discipline); PSI renders at 6 dp.
    *
    * Shape: one map-combinable (group, bin) count with conditional
    * snapshot sums, a dense grid explode, and windows over the
    * bins-sized summary frame — the raw rows shuffle once. */
  def psiDrift(df: DataFrame, valueCol: String, groupCol: String,
      snapshotCol: String, baseLabel: String, currentLabel: String,
      lo: Double, hi: Double, bins: Int,
      minShare: Double = 1e-4): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi]")
    require(minShare > 0.0 && minShare < 1.0,
      s"minShare must be in (0, 1), got $minShare")
    val v = col(valueCol).cast("double")
    val bin = when(v === hi, lit(bins - 1)).otherwise(least(
      floor((v - lit(lo)) * lit(bins.toDouble) / lit(hi - lo)).cast("int"),
      lit(bins - 1)))
    val counts = df
      .filter(col(snapshotCol).isin(baseLabel, currentLabel) &&
        v >= lo && v <= hi)
      .select(col(groupCol).as("g"), col(snapshotCol).as("s"),
        bin.as("bin"))
      .groupBy("g", "bin")
      .agg(sum(when(col("s") === baseLabel, 1L).otherwise(0L)).as("n_base"),
        sum(when(col("s") === currentLabel, 1L).otherwise(0L)).as("n_cur"))
    val grid = counts.select(col("g")).distinct()
      .select(col("g"), explode(sequence(lit(0), lit(bins - 1))).as("bin"))
    val totals = Window.partitionBy(col("g"))
    def share(n: Column, tot: Column): Column =
      greatest(when(tot > 0, round(n.cast("double") / tot, 9))
        .otherwise(lit(0.0)), lit(minShare))
    grid.join(counts, Seq("g", "bin"), "left")
      .withColumn("n_base", coalesce(col("n_base"), lit(0L)))
      .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
      .withColumn("__tb", sum(col("n_base")).over(totals))
      .withColumn("__tc", sum(col("n_cur")).over(totals))
      .withColumn("share_base", share(col("n_base"), col("__tb")))
      .withColumn("share_cur", share(col("n_cur"), col("__tc")))
      .withColumn("__t", round((col("share_cur") - col("share_base")) *
        log(col("share_cur") / col("share_base")), 10)
        .cast("decimal(28,14)"))
      .withColumn("psi", when(col("__tb") > 0L && col("__tc") > 0L,
        round(sum(col("__t")).over(totals).cast("double"), 6)))
      .select(col("g"), col("bin"),
        round(lit(lo) + col("bin") * (lit(hi - lo) / lit(bins.toDouble)), 6)
          .as("bin_lo"),
        col("n_base"), col("n_cur"), col("share_base"), col("share_cur"),
        col("psi"))
  }

  /** Exact per-group LOWER MEDIAN — the smallest value whose cumulative
    * count reaches ⌈n/2⌉ (an EXISTING value, never an interpolated
    * midpoint: engines' interpolated medians diverge in the last ulp;
    * picking an element is engine-exact). Computed from per-(group,
    * value) count SUMMARIES and one cumulative window over the value
    * domain (bounded by distinct values, never row count — the
    * percentRankNormalize discipline). Input frame must expose exactly
    * (`gName`, `vName`); null values are the caller's business. */
  private def lowerMedian(df: DataFrame, gName: String,
      vName: String): DataFrame = {
    val w = Window.partitionBy(col(gName)).orderBy(col(vName))
    df.groupBy(col(gName), col(vName)).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", max(col("__cum")).over(
        Window.partitionBy(col(gName))))
      // cum >= ceil(n/2)  ⇔  2·cum >= n (exact integer arithmetic)
      .filter(col("__cum") * 2 >= col("__n"))
      .groupBy(col(gName)).agg(min(col(vName)).as("__med"))
  }

  /** ROBUST per-group outlier flags via median/MAD — the resistant
    * sibling of [[zscoreFlags]]: mean/std move with the outliers they
    * are meant to catch (one 10^9-char document inflates its source's
    * std enough to mask every other anomaly), while median and MAD
    * (median absolute deviation) have a 50% breakdown point.
    *
    * robust z = (v − median) / (1.4826 · MAD), the standard consistency
    * constant making MAD estimate σ under normality; |rz| > `zThresh`
    * flags (3.5 is the Iglewicz–Hoaglin convention). Engine-exactness:
    * both medians PICK existing values (lower-median, see
    * [[lowerMedian]]); with integer-valued inputs every quantity up to
    * the final one-division-one-multiply rz is exact, and the DECISION
    * uses the 6-dp-rounded rz (the house boundary discipline).
    * MAD = 0 (a majority-constant group) emits null rz, false flag.
    * Null values are dropped from the input (a null is not an outlier).
    *
    * Shape: two summary-window median passes (each bounded by the value
    * domain) + two broadcast joins of group-sized frames onto a narrow
    * scoring scan — no shuffle ever carries the raw rows beyond the
    * initial (group, value) count. */
  def madOutliers(df: DataFrame, idCol: String, valueCol: String,
      groupCol: String, zThresh: Double = 3.5): DataFrame = {
    require(zThresh > 0.0, s"zThresh must be > 0, got $zThresh")
    val base = df
      .select(col(idCol), col(groupCol).as("__g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val med = lowerMedian(base.select(col("__g"), col("v")), "__g", "v")
    val withMed = base.join(broadcast(med), Seq("__g"))
    val mad = lowerMedian(
      withMed.select(col("__g"), abs(col("v") - col("__med")).as("v")),
      "__g", "v").withColumnRenamed("__med", "__mad")
    withMed.join(broadcast(mad), Seq("__g"))
      .withColumn("rz", when(col("__mad") > 0.0,
        round((col("v") - col("__med")) /
          (lit(1.4826) * col("__mad")), 6)))
      .withColumn("is_outlier", coalesce(abs(col("rz")) > zThresh,
        lit(false)))
      .select(col(idCol), col("__g").as(groupCol), col("v"),
        col("__med").as("med"), col("__mad").as("mad"), col("rz"),
        col("is_outlier"))
  }

  /** ROBUST per-group scaling (median/IQR) — the feature-engineering
    * normalizer that survives heavy tails where [[zscoreFlags]]' mean/σ
    * is dragged by the outliers it's meant to expose:
    * scaled = (v − median) / (q3 − q1). Groups with IQR 0 (over half
    * the mass on one value) emit null scaled — no verdict, not ±∞.
    *
    * Exactness: median and quartiles are PICKED existing values at
    * ranks ⌈q·n⌉ of the group ECDF (never interpolated — engines'
    * interpolation conventions diverge in the last ulp; picking an
    * element is engine-exact), the division is one fixed-
    * parenthesization IEEE op, 6-dp render.
    *
    * Shape: one (group, value) count shuffle; the cumulative window
    * runs over the value-domain summary frame (the [[madOutliers]]
    * discipline); the three 1-row-per-group quantile frames broadcast
    * back onto a zero-shuffle scoring scan. */
  def robustScale(df: DataFrame, idCol: String, valueCol: String,
      groupCol: String): DataFrame = {
    val base = df
      .select(col(idCol), col(groupCol).as("__g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val w = Window.partitionBy(col("__g")).orderBy(col("v"))
    val cum = base.groupBy("__g", "v").agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n",
        max(col("__cum")).over(Window.partitionBy(col("__g"))))
    def pick(q: Double, name: String): DataFrame = cum
      .filter(col("__cum") >= ceil(lit(q) * col("__n")))
      .groupBy("__g").agg(min(col("v")).as(name))
    base
      .join(broadcast(pick(0.5, "med")), Seq("__g"))
      .join(broadcast(pick(0.25, "q1")), Seq("__g"))
      .join(broadcast(pick(0.75, "q3")), Seq("__g"))
      .withColumn("scaled", when(col("q3") > col("q1"),
        round((col("v") - col("med")) / (col("q3") - col("q1")), 6)))
      .select(col(idCol), col("__g").as(groupCol), col("v"), col("med"),
        col("q1"), col("q3"), col("scaled"))
  }

  /** Two-sample Kolmogorov–Smirnov drift test per group — the
    * distribution-free companion of [[psiDrift]] (PSI needs a binning
    * choice; KS compares the FULL empirical CDFs and is sensitive
    * anywhere they separate): D = max over observed values of
    * |F̂_base(v) − F̂_cur(v)|, flagged against the large-sample critical
    * value c(α)·√((n₁+n₂)/(n₁·n₂)) (c = 1.358 at α = 0.05).
    *
    * Exactness: the ECDF steps are single IEEE divisions of exact
    * integer cumulative counts (identical operation order in the
    * oracle), D is a max over that identical double set, and the drift
    * decision compares the 6-dp renders of D and the critical value —
    * engine-stable. A group missing either sample emits null D (no
    * drift verdict), not a division error.
    *
    * Shape: raw rows shuffle ONCE into per-(group, value) counts; the
    * cumulative window runs over the value-domain-sized summary frame
    * (the [[psiDrift]]/[[madOutliers]] discipline — never a window over
    * raw rows). */
  def ksTwoSample(df: DataFrame, valueCol: String, groupCol: String,
      snapshotCol: String, baseLabel: String, currentLabel: String,
      critical: Double = 1.358): DataFrame = {
    require(critical > 0.0, s"critical must be > 0, got $critical")
    val counts = df
      .filter(col(snapshotCol).isin(baseLabel, currentLabel) &&
        col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(snapshotCol).as("s"),
        col(valueCol).cast("double").as("v"))
      .groupBy("g", "v")
      .agg(sum(when(col("s") === baseLabel, 1L).otherwise(0L)).as("__nb"),
        sum(when(col("s") === currentLabel, 1L).otherwise(0L)).as("__nc"))
    val cum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("g"))
    val tb = col("__tb").cast("double")
    val tc = col("__tc").cast("double")
    val d = abs(col("__cb").cast("double") / tb -
      col("__cc").cast("double") / tc)
    counts
      .withColumn("__cb", sum(col("__nb")).over(cum))
      .withColumn("__cc", sum(col("__nc")).over(cum))
      .withColumn("__tb", sum(col("__nb")).over(tot))
      .withColumn("__tc", sum(col("__nc")).over(tot))
      .withColumn("__d", when(col("__tb") > 0L && col("__tc") > 0L, d))
      .groupBy(col("g"))
      .agg(max(col("__tb")).as("n_base"), max(col("__tc")).as("n_cur"),
        round(max(col("__d")), 6).as("ks_d"))
      .withColumn("ks_crit", when(col("n_base") > 0L && col("n_cur") > 0L,
        round(lit(critical) * sqrt(
          (col("n_base").cast("double") + col("n_cur").cast("double")) /
            (col("n_base").cast("double") * col("n_cur").cast("double"))),
          6)))
      .withColumn("drifted", col("ks_d") > col("ks_crit"))
  }

  /** Wilson score interval for a per-group binomial proportion — the
    * conversion-rate / pass-rate readout with honest uncertainty at
    * small n (the naive ±z√(p(1−p)/n) interval collapses to a point at
    * p∈{0,1} and escapes [0,1]; Wilson does neither):
    *
    *   center = (p + z²/2n) / (1 + z²/n)
    *   margin = z·√(p(1−p)/n + z²/4n²) / (1 + z²/n)
    *
    * `flagCol` is the success predicate. One count-only group shuffle
    * (map-combinable); the interval arithmetic runs on the group-sized
    * result. The formula is evaluated with FIXED parenthesization in
    * doubles — the SQL oracle mirrors the same operation order, so both
    * engines produce identical IEEE results, rendered at 6 dp. */
  def wilsonIntervals(df: DataFrame, groupCols: Seq[String],
      flag: org.apache.spark.sql.Column, z: Double = 1.96): DataFrame = {
    require(z > 0.0, s"z must be > 0, got $z")
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count(when(flag, lit(1))).as("successes"))
    val nD = col("n").cast("double")
    val p = col("successes").cast("double") / nD
    val z2 = lit(z) * lit(z)
    val denom = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / denom
    val margin = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      z2 / (lit(4.0) * nD * nD))) / denom
    counts.select(groupCols.map(col) ++ Seq(col("n"), col("successes"),
      round(p, 6).as("p_hat"),
      round(center - margin, 6).as("ci_lo"),
      round(center + margin, 6).as("ci_hi")): _*)
  }

  /** 1-D Wasserstein-1 (earth-mover's) distance between two snapshots
    * of a value distribution per group — the MAGNITUDE companion of
    * [[ksTwoSample]] (KS reports the worst single separation of the
    * ECDFs; W₁ = ∫|F̂_base − F̂_cur| dv integrates separation over the
    * value axis, so a long small shift and a short large one are told
    * apart — the "how far did the feature move, in its own units"
    * readout model monitoring wants next to a drifted/not verdict):
    *
    *   W₁ = Σ over consecutive observed values |F̂b(vᵢ) − F̂c(vᵢ)|·(vᵢ₊₁ − vᵢ)
    *
    * Exactness: each ECDF step is a single IEEE division of exact
    * cumulative integer counts, the |·|·Δv product is one
    * fixed-parenthesization double multiply, and each term quantizes to
    * DECIMAL(28,14) before the order-invariant exact sum (the
    * [[psiDrift]] term discipline); double cast + 6-dp render at the
    * edge only. A group missing either sample emits null (no distance),
    * not a division error.
    *
    * Shape: raw rows shuffle ONCE into per-(group, value) counts; the
    * cumulative + lead windows run over the value-domain-sized summary
    * frame, never raw rows. */
  def emdDrift(df: DataFrame, valueCol: String, groupCol: String,
      snapshotCol: String, baseLabel: String,
      currentLabel: String): DataFrame = {
    val counts = df
      .filter(col(snapshotCol).isin(baseLabel, currentLabel) &&
        col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(snapshotCol).as("s"),
        col(valueCol).cast("double").as("v"))
      .groupBy("g", "v")
      .agg(sum(when(col("s") === baseLabel, 1L).otherwise(0L)).as("__nb"),
        sum(when(col("s") === currentLabel, 1L).otherwise(0L)).as("__nc"))
    val cum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nxt = Window.partitionBy(col("g")).orderBy(col("v"))
    val tot = Window.partitionBy(col("g"))
    val gap = abs(col("__cb").cast("double") / col("__tb").cast("double") -
      col("__cc").cast("double") / col("__tc").cast("double"))
    counts
      .withColumn("__cb", sum(col("__nb")).over(cum))
      .withColumn("__cc", sum(col("__nc")).over(cum))
      .withColumn("__tb", sum(col("__nb")).over(tot))
      .withColumn("__tc", sum(col("__nc")).over(tot))
      .withColumn("__nv", lead(col("v"), 1).over(nxt))
      .withColumn("__term", when(
        col("__tb") > 0L && col("__tc") > 0L && col("__nv").isNotNull,
        (gap * (col("__nv") - col("v"))).cast("decimal(28,14)")))
      .groupBy(col("g"))
      .agg(max(col("__tb")).as("n_base"), max(col("__tc")).as("n_cur"),
        when(max(col("__tb")) > 0L && max(col("__tc")) > 0L,
          round(coalesce(sum(col("__term")).cast("double"), lit(0.0)), 6))
          .as("emd"))
  }

  /** Cohen's kappa agreement per group between two label columns — the
    * chance-corrected "do my two raters/filters actually agree?" audit
    * (raw percent agreement flatters any pair of raters on a skewed
    * label distribution; kappa subtracts the agreement their marginals
    * would produce by chance). The pipeline use: two quality filters or
    * an annotator pair disagreeing near κ≈0 means the cheaper one is NOT
    * a substitute, whatever the raw overlap says.
    *
    *   κ = (p_o − p_e)/(1 − p_e),  p_e = Σ_k (nAₖ/n)·(nBₖ/n)
    *
    * Rows where either label is null are excluded (an unlabeled item is
    * not a disagreement). Groups with p_e = 1 (both raters constant)
    * emit null κ. Exactness: each p_e term is two single IEEE divisions
    * and one multiply in fixed order, quantized to DECIMAL(28,14)
    * before the exact sum; κ is computed on unrounded doubles and
    * rendered at 6 dp alongside 6-dp p_o/p_e.
    *
    * Shape: ONE shuffle into per-(group, labelA, labelB) cell counts
    * (map-combinable); marginals and the p_e join all run on the
    * label-domain-sized summary frame. */
  def cohenKappa(df: DataFrame, groupCol: String, raterACol: String,
      raterBCol: String): DataFrame = {
    val cells = df
      .filter(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .select(col(groupCol).as("g"),
        col(raterACol).cast("string").as("la"),
        col(raterBCol).cast("string").as("lb"))
      .groupBy("g", "la", "lb").agg(count(lit(1)).as("c"))
    val perG = cells.groupBy("g")
      .agg(sum(col("c")).as("n"),
        sum(when(col("la") === col("lb"), col("c")).otherwise(0L))
          .as("__agree"))
    val margA = cells.groupBy(col("g"), col("la").as("k"))
      .agg(sum(col("c")).as("__na"))
    val margB = cells.groupBy(col("g"), col("lb").as("k"))
      .agg(sum(col("c")).as("__nb"))
    val pe = margA.join(margB, Seq("g", "k"))
      .join(perG.select(col("g"), col("n")), Seq("g"))
      .withColumn("__term",
        ((col("__na").cast("double") / col("n").cast("double")) *
          (col("__nb").cast("double") / col("n").cast("double")))
          .cast("decimal(28,14)"))
      .groupBy("g").agg(sum(col("__term")).cast("double").as("__pe"))
    val po = col("__agree").cast("double") / col("n").cast("double")
    // left join + 0-coalesce: two raters with DISJOINT label vocabularies
    // produce no shared marginal key (p_e = 0), not a dropped group
    perG.join(pe, Seq("g"), "left")
      .withColumn("__pe", coalesce(col("__pe"), lit(0.0)))
      .select(col("g"), col("n"), round(po, 6).as("p_o"),
        round(col("__pe"), 6).as("p_e"),
        when(col("__pe") < 1.0,
          round((po - col("__pe")) / (lit(1.0) - col("__pe")), 6))
          .as("kappa"))
  }

  /** Reliability diagram for a probabilistic [0, 1] score against a
    * boolean outcome — per fixed-width score bin: count, mean score
    * (confidence), empirical positive rate (accuracy), and the
    * |acc − conf| gap. A well-calibrated quality/relevance classifier
    * tracks the diagonal; the diagram says WHERE its thresholds lie to
    * the keep/drop decisions downstream. Bin arithmetic is the clamped
    * [[histogram]] form over [0, 1] (a score of exactly 1 closes the
    * last bin); out-of-range and null scores/labels are dropped. Empty
    * bins emit n = 0 with null rates.
    *
    * Exactness: scores quantize to DECIMAL(28,14) per row before the
    * order-invariant sum (a double sum's value depends on partial-agg
    * order); conf/acc are single divisions of the exact sums rendered
    * at 6 dp; the gap subtracts the UNROUNDED doubles, fixed
    * parenthesization, 6 dp.
    *
    * Shape: one map-combinable bin shuffle; the dense bin grid is an
    * in-plan sequence explode. */
  def calibrationBins(df: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val p = col(scoreCol).cast("double")
    val bin = when(p === 1.0, lit(bins - 1)).otherwise(least(
      floor(p * lit(bins.toDouble)).cast("int"), lit(bins - 1)))
    val counts = df
      .filter(p >= 0.0 && p <= 1.0 && col(labelCol).isNotNull)
      .select(bin.as("bin"), p.cast("decimal(28,14)").as("__p"),
        col(labelCol).cast("boolean").as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__p")).as("__sp"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"))
    val grid = df.sparkSession.range(bins.toLong)
      .select(col("id").cast("int").as("bin"))
    val conf = col("__sp").cast("double") / col("n").cast("double")
    val acc = col("__pos").cast("double") / col("n").cast("double")
    grid.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        round(col("bin") * (lit(1.0) / lit(bins.toDouble)), 6)
          .as("bin_lo"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(conf, 6).as("conf"), round(acc, 6).as("acc"),
        round(abs(acc - conf), 6).as("gap"))
  }

  /** One-row calibration summary: expected calibration error and Brier
    * score for a [0, 1] score against a boolean outcome — the two
    * numbers a score-producing filter reports on its data card (ECE =
    * Σ_b (n_b/N)·|acc_b − conf_b| over the [[calibrationBins]] grid;
    * Brier = mean (p − y)², decomposable but reported whole).
    *
    * Exactness: Brier runs on per-row (p − y)² quantized to
    * DECIMAL(28,14) before the exact sum, one division at the edge; ECE
    * terms quantize the same way over the bin-sized frame. 6-dp
    * renders. One bin shuffle total (the Brier moments ride the same
    * aggregation). */
  def calibrationSummary(df: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val p = col(scoreCol).cast("double")
    val bin = when(p === 1.0, lit(bins - 1)).otherwise(least(
      floor(p * lit(bins.toDouble)).cast("int"), lit(bins - 1)))
    val y = col("__y").cast("double")
    val perBin = df
      .filter(p >= 0.0 && p <= 1.0 && col(labelCol).isNotNull)
      .select(bin.as("bin"), p.as("__p"),
        col(labelCol).cast("boolean").as("__y"))
      .select(col("bin"), col("__p").cast("decimal(28,14)").as("__pq"),
        when(col("__y"), 1L).otherwise(0L).as("__yi"),
        ((col("__p") - y) * (col("__p") - y)).cast("decimal(28,14)")
          .as("__sq"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__pq")).as("__sp"),
        sum(col("__yi")).as("__pos"), sum(col("__sq")).as("__ssq"))
    val conf = col("__sp").cast("double") / col("n").cast("double")
    val acc = col("__pos").cast("double") / col("n").cast("double")
    // grand total via a broadcast 1-row frame (the q_assoc_rules
    // pattern), not an unpartitioned window — same value, no
    // single-partition window stage in the plan
    val totalN = perBin.groupBy().agg(sum(col("n")).as("__N"))
    perBin
      .crossJoin(broadcast(totalN))
      .withColumn("__term",
        ((col("n").cast("double") / col("__N").cast("double")) *
          abs(acc - conf)).cast("decimal(28,14)"))
      .groupBy()
      .agg(max(col("__N")).as("n"),
        round(sum(col("__pos")).cast("double") /
          max(col("__N")).cast("double"), 6).as("base_rate"),
        round(sum(col("__ssq")).cast("double") /
          max(col("__N")).cast("double"), 6).as("brier"),
        round(sum(col("__term")).cast("double"), 6).as("ece"))
  }

  /** Kaplan–Meier product-limit survival curve per group — the
    * retention/lifetime readout that handles CENSORING honestly (a
    * subject still alive at observation end is partial information, not
    * a death; dropping or counting censored rows as events both bias
    * the curve). Per event time t (rows emitted at event times only,
    * the standard KM step points):
    *
    *   n_risk(t) = subjects with duration ≥ t
    *   S(t)      = Π_{tᵢ ≤ t} (1 − dᵢ/n_risk(tᵢ))
    *
    * `eventCol` true = event observed at `durationCol`, false =
    * censored there (leaves the risk set, no survival step).
    *
    * Engine-exactness: each factor 1 − d/n is a single IEEE division of
    * exact integer counts rounded to 9 dp before the ln (both engines
    * feed ln the same double — the [[psiDrift]] discipline), ln terms
    * round to 10 dp and quantize to DECIMAL(28,14), the cumulative sum
    * rides a window over the time-domain summary frame, and exp sees
    * the 10-dp-rounded double sum; 6-dp render. A time where the whole
    * risk set dies (d = n) zeroes the curve from there on (ln(0) never
    * evaluates — an explicit flag carries the zero forward).
    *
    * Shape: raw rows shuffle ONCE into per-(group, t) event/censor
    * counts; every window (risk-set depletion, log-survival cumsum,
    * zero-flag) runs over the time-domain summary frame, never raw
    * rows. */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String,
      groupCol: String): DataFrame = {
    val counts = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .select(col(groupCol).as("g"),
        col(durationCol).cast("double").as("t"),
        col(eventCol).cast("boolean").as("e"))
      .groupBy("g", "t")
      .agg(sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        sum(when(!col("e"), 1L).otherwise(0L)).as("c"))
    val wOrd = Window.partitionBy(col("g")).orderBy(col("t"))
    val prevRows = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val inclRows = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val tot = Window.partitionBy(col("g"))
    val factor = lit(1.0) - round(col("d").cast("double") /
      col("n_risk").cast("double"), 9)
    counts
      .withColumn("n_risk", sum(col("d") + col("c")).over(tot) -
        coalesce(sum(col("d") + col("c")).over(prevRows), lit(0L)))
      .withColumn("__lf", when(col("d") > 0L && col("d") < col("n_risk"),
        round(log(factor), 10).cast("decimal(28,14)"))
        .otherwise(lit(0).cast("decimal(28,14)")))
      .withColumn("__dead", max(when(col("d") === col("n_risk"), 1)
        .otherwise(0)).over(inclRows))
      .withColumn("survival", when(col("__dead") === 1, lit(0.0))
        .otherwise(round(exp(round(sum(col("__lf")).over(inclRows)
          .cast("double"), 10)), 6)))
      .filter(col("d") > 0L)
      .select(col("g"), col("t"), col("n_risk"), col("d"), col("c"),
        col("survival"))
  }

  /** Spearman rank correlation per group between two value columns —
    * the monotone-association readout Pearson can't give (Pearson sees
    * linearity; Spearman sees any monotone trend, outlier-robust, the
    * "is this feature drifting WITH time/size/score" question). Average
    * ranks for ties (the standard tie convention), Pearson on the
    * ranks.
    *
    * Exactness trick: DOUBLED average ranks are exact integers
    * (2·avgrank = 2·rank_min + cnt − 1), so every moment (Σa, Σa²,
    * Σab) is an exact DECIMAL(38,0) integer sum — no floating ranks
    * anywhere, and Pearson is affine-invariant so the ×2 cancels. The
    * final ρ is fixed-parenthesization double arithmetic on the exact
    * moments ([[corrMatrix]] discipline), 6-dp render; constant
    * columns (zero rank variance) emit null.
    *
    * Shape: NO window over raw rows — rank_min = cumulative count over
    * the per-(group, value) summary frame (the [[percentRankNormalize]]
    * ECDF machinery), joined back on (group, value). Two count
    * shuffles + two summary joins + one moment aggregate. */
  def spearmanCorr(df: DataFrame, xCol: String, yCol: String,
      groupCol: String): DataFrame = {
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("g"), col(xCol).cast("double").as("a"),
        col(yCol).cast("double").as("b"))
    // renamed join keys: ra/rb share base's lineage, and dataframe-
    // qualified g/v references on a self-derived join are ambiguous.
    // The per-group cumulative count runs as the bucketed distributed
    // prefix sum (Pipeline.runningSum) — the former per-(group) value
    // window was one task per group, this operator's scale ceiling
    // (the bestSplit rework applied here); the cell frame is
    // checkpointed because the prefix sum's plan-build quantile sketch
    // is itself an action.
    def ranks2(vc: String, gk: String, vk: String,
        rName: String): DataFrame = {
      val cells = base.groupBy(col("g").as(gk), col(vc).as(vk))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      Pipeline.runningSum(cells, vk, col("cnt"), "__cum",
          buckets = 32, partCols = Seq(gk))
        // 2·avgrank = 2·(cum − cnt + 1) + (cnt − 1) = 2·cum − cnt + 1
        .select(col(gk), col(vk),
          (lit(2L) * col("__cum") - col("cnt") + lit(1L)).as(rName))
    }
    val ra = ranks2("a", "__ga", "__va", "__sa")
    val rb = ranks2("b", "__gb", "__vb", "__sb")
    def qd(c: Column) = c.cast("decimal(19,0)")
    // SHUFFLE_HASH, not broadcast: the rank tables scale with the value
    // domain (~row count for continuous columns) — AQE's runtime
    // broadcast of them cost a ~600k-row driver collect per join at
    // gate scale (round-16 audit: wall ≫ task-sec) and is impossible at
    // 100×; the hash join shuffles base once per rank side instead.
    val joined = base
      .join(ra.hint("SHUFFLE_HASH"),
        col("g") === col("__ga") && col("a") === col("__va"))
      .join(rb.hint("SHUFFLE_HASH"),
        col("g") === col("__gb") && col("b") === col("__vb"))
    val moments = joined.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(qd(col("__sa"))).cast("decimal(38,0)").as("__ta"),
        sum(qd(col("__sb"))).cast("decimal(38,0)").as("__tb"),
        sum(qd(col("__sa")) * qd(col("__sa"))).cast("decimal(38,0)")
          .as("__taa"),
        sum(qd(col("__sb")) * qd(col("__sb"))).cast("decimal(38,0)")
          .as("__tbb"),
        sum(qd(col("__sa")) * qd(col("__sb"))).cast("decimal(38,0)")
          .as("__tab"))
    val n = col("n").cast("double")
    def d(c: Column) = c.cast("double")
    val num = n * d(col("__tab")) - d(col("__ta")) * d(col("__tb"))
    val denA = n * d(col("__taa")) - d(col("__ta")) * d(col("__ta"))
    val denB = n * d(col("__tbb")) - d(col("__tb")) * d(col("__tb"))
    moments.select(col("g"), col("n"),
      when(denA > 0.0 && denB > 0.0,
        round(num / (sqrt(denA) * sqrt(denB)), 6)).as("rho"))
  }

  /** ln 2 as a compiled full-precision constant, shared by
    * [[jsDivergence]] and (textually) its oracle — the nats→bits
    * division never calls an engine log. */
  val Ln2: Double = 0.6931471805599453

  /** Jensen–Shannon divergence (base 2, in [0, 1]) between two
    * snapshots of a CATEGORICAL distribution per group — the
    * vocabulary/label-drift companion of [[psiDrift]] (PSI needs
    * numeric bins and explodes on empty ones; JSD is the symmetric,
    * always-finite KL blend that handles categories present in only
    * one snapshot natively):
    *
    *   JSD = ½·KL(p ‖ m) + ½·KL(q ‖ m),  m = (p + q)/2
    *
    * Engine-exactness: shares round to 9 dp before any ln (the
    * [[psiDrift]] discipline), m rounds to 9 dp off the rounded
    * shares, each p·ln(p/m) term rounds to 10 dp and quantizes to
    * DECIMAL(28,14) for the order-invariant sum; the two KL halves sum
    * SEPARATELY and combine with fixed parenthesization; ÷[[Ln2]] is a
    * compiled constant; 6-dp render. Zero-share terms contribute
    * exactly 0 (0·ln 0 = 0, in-plan guard, never an ln(0) call).
    * A group missing either snapshot emits null.
    *
    * Shape: raw rows shuffle ONCE into per-(group, category) counts;
    * totals and both KL sums ride the category-domain summary frame. */
  def jsDivergence(df: DataFrame, categoryCol: String,
      snapshotCol: String, baseLabel: String, currentLabel: String,
      groupCol: String): DataFrame = {
    val counts = df
      .filter(col(snapshotCol).isin(baseLabel, currentLabel) &&
        col(categoryCol).isNotNull)
      .select(col(groupCol).as("g"), col(snapshotCol).as("s"),
        col(categoryCol).as("cat"))
      .groupBy("g", "cat")
      .agg(sum(when(col("s") === baseLabel, 1L).otherwise(0L)).as("__nb"),
        sum(when(col("s") === currentLabel, 1L).otherwise(0L)).as("__nc"))
    val tot = Window.partitionBy(col("g"))
    def share(nc: Column, tc: Column): Column =
      when(tc > 0L, round(nc.cast("double") / tc.cast("double"), 9))
        .otherwise(lit(0.0))
    def klTerm(p: Column, m: Column): Column =
      when(p > 0.0, round(p * log(p / m), 10).cast("decimal(28,14)"))
        .otherwise(lit(0).cast("decimal(28,14)"))
    counts
      .withColumn("__tb", sum(col("__nb")).over(tot))
      .withColumn("__tc", sum(col("__nc")).over(tot))
      .withColumn("__p", share(col("__nb"), col("__tb")))
      .withColumn("__q", share(col("__nc"), col("__tc")))
      .withColumn("__m", round((col("__p") + col("__q")) * 0.5, 9))
      .groupBy(col("g"))
      .agg(max(col("__tb")).as("n_base"), max(col("__tc")).as("n_cur"),
        count(lit(1)).as("n_categories"),
        when(max(col("__tb")) > 0L && max(col("__tc")) > 0L,
          round((sum(klTerm(col("__p"), col("__m"))).cast("double") +
            sum(klTerm(col("__q"), col("__m"))).cast("double")) * 0.5 /
            lit(Ln2), 6)).as("jsd"))
  }

  /** Cramér's V association between two categorical columns per group —
    * the "are these two labels entangled?" audit ([[cohenKappa]] needs
    * the SAME label space on both sides; V works on any r×c pair —
    * lang × source, template × split — and normalizes χ² to [0, 1]
    * so strength is comparable across tables):
    *
    *   V = √( χ² / (n · (min(r, c) − 1)) ),
    *   χ² = Σ_cells (o − e)²/e,  e = rowTotal·colTotal/n
    *
    * Engine-exactness: e is fixed-parenthesization double arithmetic
    * on exact integer totals ((row·col)/n), each χ² cell term rounds
    * to 10 dp and quantizes to DECIMAL(28,14) before the
    * order-invariant sum; √ is correctly rounded IEEE in any engine; V
    * computes off the UNROUNDED χ² double, both render at 6 dp.
    * Degenerate groups (r < 2 or c < 2) emit null V (χ² still
    * reported — it is 0 by construction there).
    *
    * Shape: ONE map-combinable (group, a, b) cell shuffle; marginals,
    * the dense r×c grid (zero-observed cells still owe their e term)
    * and the χ² sum all ride label-domain-sized summary frames. */
  def cramersV(df: DataFrame, aCol: String, bCol: String,
      groupCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(groupCol).as("g"), col(aCol).cast("string").as("la"),
        col(bCol).cast("string").as("lb"))
      .groupBy("g", "la", "lb").agg(count(lit(1)).as("o"))
    val margA = cells.groupBy("g", "la").agg(sum(col("o")).as("__ra"))
    val margB = cells.groupBy("g", "lb").agg(sum(col("o")).as("__cb"))
    val perG = cells.groupBy("g").agg(sum(col("o")).as("n"))
    val grid = margA.join(margB, Seq("g")).join(perG, Seq("g"))
    val e = col("__ra").cast("double") * col("__cb").cast("double") /
      col("n").cast("double")
    val o = coalesce(col("o"), lit(0L)).cast("double")
    val chi2 = sum(round((o - e) * (o - e) / e, 10)
      .cast("decimal(28,14)")).cast("double")
    val stats = grid
      .join(cells, Seq("g", "la", "lb"), "left")
      .groupBy(col("g"))
      .agg(max(col("n")).as("n"),
        countDistinct(col("la")).as("n_rows"),
        countDistinct(col("lb")).as("n_cols"), chi2.as("__chi2"))
    val minDim = least(col("n_rows"), col("n_cols")) - lit(1L)
    stats.select(col("g"), col("n"), col("n_rows"), col("n_cols"),
      round(col("__chi2"), 6).as("chi2"),
      when(minDim > 0L && col("n") > 0L,
        round(sqrt(col("__chi2") / (col("n").cast("double") *
          minDim.cast("double"))), 6)).as("v"))
  }

  /** χ² INDEPENDENCE TEST per group with a Wilson–Hilferty p-value —
    * the significance companion of [[cramersV]] (V reports association
    * STRENGTH normalized to [0,1]; this reports whether the observed
    * table is surprising under independence at all — V ≈ 0.1 can be
    * decisive at n = 10⁶ and noise at n = 40): the same exact
    * cell/marginal machinery yields χ² and df = (r−1)(c−1); the p comes
    * from the Wilson–Hilferty cube-root normal approximation
    *
    *   z = ( (χ²/df)^⅓ − (1 − 2/(9df)) ) / √(2/(9df)),
    *   p = P(χ²_df > χ²) ≈ P(Z > z)
    *
    * — elementary ops only (cbrt, sqrt — correctly-rounded IEEE in both
    * engines), no incomplete gamma, |error| < 1e-3 for df ≥ 1 (the
    * standard approximation; documented). The one-sided tail is the
    * [[normalTwoSidedP]] A&S polynomial halved on the z ≥ 0 branch and
    * complemented below: p = p₂/2 if z ≥ 0 else 1 − p₂/2, computed on
    * the 9-dp-quantized p₂ so both engines quantize identically before
    * the branch; 6-dp render. Degenerate tables (df = 0) emit null
    * z/p. Shape: identical to [[cramersV]] — one cell shuffle,
    * label-domain marginal grid, group-sized output. */
  def chiSquareTest(df: DataFrame, aCol: String, bCol: String,
      groupCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(groupCol).as("g"), col(aCol).cast("string").as("la"),
        col(bCol).cast("string").as("lb"))
      .groupBy("g", "la", "lb").agg(count(lit(1)).as("o"))
    val margA = cells.groupBy("g", "la").agg(sum(col("o")).as("__ra"))
    val margB = cells.groupBy("g", "lb").agg(sum(col("o")).as("__cb"))
    val perG = cells.groupBy("g").agg(sum(col("o")).as("n"))
    val grid = margA.join(margB, Seq("g")).join(perG, Seq("g"))
    val e = col("__ra").cast("double") * col("__cb").cast("double") /
      col("n").cast("double")
    val o = coalesce(col("o"), lit(0L)).cast("double")
    val chi2 = sum(round((o - e) * (o - e) / e, 10)
      .cast("decimal(28,14)")).cast("double")
    val stats = grid
      .join(cells, Seq("g", "la", "lb"), "left")
      .groupBy(col("g"))
      .agg(max(col("n")).as("n"),
        countDistinct(col("la")).as("n_rows"),
        countDistinct(col("lb")).as("n_cols"), chi2.as("__chi2"))
      .withColumn("df",
        (col("n_rows") - 1L) * (col("n_cols") - 1L))
    val dfD = col("df").cast("double")
    val z = (cbrt(col("__chi2") / dfD) -
      (lit(1.0) - lit(2.0) / (lit(9.0) * dfD))) /
      sqrt(lit(2.0) / (lit(9.0) * dfD))
    val z9 = round(z, 9)
    val p2 = normalTwoSidedP(col("__z9"))
    stats
      .withColumn("__z9", when(col("df") > 0L && col("n") > 0L, z9))
      .select(col("g"), col("n"), col("n_rows"), col("n_cols"),
        col("df"), round(col("__chi2"), 6).as("chi2"),
        round(col("__z9"), 6).as("z_wh"),
        when(col("__z9").isNotNull,
          round(when(col("__z9") >= 0.0, p2 / lit(2.0))
            .otherwise(lit(1.0) - p2 / lit(2.0)), 6)).as("p_value"))
  }

  /** EFFECTIVE SAMPLE SIZE and design effect of a WEIGHTED sample per
    * group (Kish 1965) — the honesty metric every weighted pipeline
    * (importance resampling L33, temperature mixing L37, survey-style
    * reweighting) owes its consumers: n rows carrying unequal weights
    * hold the statistical information of only
    *
    *   ESS = (Σw)² / Σw²   rows,   deff = n / ESS ≥ 1
    *
    * (equal weights ⇒ ESS = n, deff = 1; one dominant weight ⇒ ESS → 1).
    * Exactness: weights quantize to DECIMAL(14,4); Σw and Σw² are exact
    * DECIMAL sums (squares in DECIMAL(38,8)); ESS/deff are single
    * fixed-parenthesization double chains, 6-dp renders. Null/negative
    * weights drop (counted in `n_dropped`). ONE map-combinable group
    * aggregation — no joins, no windows. */
  def effectiveSampleSize(df: DataFrame, weightCol: String,
      groupCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("g"),
      col(weightCol).cast("decimal(14,4)").as("__w"))
    val agg = base.groupBy("g").agg(
      sum(when(col("__w").isNull || col("__w") <= 0, 1L).otherwise(0L))
        .as("n_dropped"),
      count(when(col("__w") > 0, lit(1))).as("n"),
      sum(when(col("__w") > 0, col("__w"))).cast("decimal(38,4)")
        .as("__sw"),
      sum(when(col("__w") > 0,
        (col("__w") * col("__w")).cast("decimal(38,8)")))
        .cast("decimal(38,8)").as("__sw2"))
    def d(c: Column) = c.cast("double")
    val ess = d(col("__sw")) * d(col("__sw")) / d(col("__sw2"))
    agg.select(col("g"), col("n"), col("n_dropped"),
      round(d(col("__sw")), 6).as("sum_w"),
      when(col("n") > 0L, round(ess, 6)).as("ess"),
      when(col("n") > 0L, round(d(col("n")) / ess, 6)).as("deff"))
  }

  /** Shared doubled-average-rank machinery over a two-class count frame:
    * per (group, value) class counts → cumulative count window over the
    * VALUE-DOMAIN summary frame (never raw rows) → 2·avgrank = 2·cum −
    * cnt + 1, an exact integer under any tie pattern (the
    * [[spearmanCorr]] trick). Returns the count frame with `__cnt`,
    * `__r2` attached. */
  private def rankedTwoClass(df: DataFrame, valueCol: String,
      inA: Column, groupCol: String): DataFrame = {
    val counts = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"),
        inA.as("__ina"))
      .groupBy("g", "v")
      .agg(sum(when(col("__ina"), 1L).otherwise(0L)).as("__na"),
        sum(when(!col("__ina"), 1L).otherwise(0L)).as("__nb"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__cnt", col("__na") + col("__nb"))
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__r2", lit(2L) * col("__cum") - col("__cnt") + lit(1L))
  }

  /** Grouped ROC-AUC — the threshold-free ranking quality of a score
    * against a boolean label (the companion of [[calibrationBins]]:
    * calibration asks "are the probabilities honest?", AUC asks "does
    * the score ORDER positives above negatives at all?"). Computed
    * EXACTLY by the rank-sum identity with average-rank ties:
    *
    *   AUC = (R⁺ − n₊(n₊+1)/2) / (n₊·n₋),  R⁺ = Σ avgrank(positives)
    *
    * Exactness: doubled average ranks are exact integers off the
    * per-(group, score) count frame ([[spearmanCorr]]), so the doubled
    * rank-sum S₂ = Σ n₊(v)·r₂(v) is an exact DECIMAL(38,0) sum and
    * AUC = (S₂ − n₊(n₊+1)) / (2·n₊·n₋) is ONE fixed-parenthesization
    * double expression both engines fold identically; 6-dp render.
    * Single-class groups emit null.
    *
    * Shape: one (group, score) count shuffle; the only window rides the
    * score-domain summary frame. Equivalent to integrating the ROC
    * curve exactly — no threshold grid, no approximation. */
  def aucRoc(df: DataFrame, scoreCol: String, labelCol: String,
      groupCol: String): DataFrame = {
    val ranked = rankedTwoClass(
      df.filter(col(labelCol).isNotNull), scoreCol,
      col(labelCol).cast("boolean"), groupCol)
    def qd(c: Column) = c.cast("decimal(19,0)")
    ranked.groupBy("g")
      .agg(sum(col("__na")).as("n_pos"), sum(col("__nb")).as("n_neg"),
        sum(qd(col("__na")) * qd(col("__r2"))).cast("decimal(38,0)")
          .as("__s2"))
      .select(col("g"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          round((col("__s2").cast("double") -
            col("n_pos").cast("double") *
              (col("n_pos") + lit(1L)).cast("double")) /
            (lit(2.0) * col("n_pos").cast("double") *
              col("n_neg").cast("double")), 6)).as("auc"))
  }

  /** Grouped two-sample Mann–Whitney U test — the nonparametric
    * location-shift companion of the Welch t readout (no normality
    * assumption; a monotone transform of the metric changes nothing)
    * and of [[ksTwoSample]] (KS asks "different distribution anywhere?",
    * U asks "does one sample stochastically dominate?"):
    *
    *   U = R_A − n_a(n_a+1)/2,
    *   z = (U − n_a·n_b/2) / σ,
    *   σ² = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1)))   (tie-corrected)
    *
    * U itself is exact (a half-integer at worst — doubled rank-sums are
    * exact integers, [[aucRoc]]); Σ(t³−t) is an exact DECIMAL sum over
    * the tie-group sizes; z is fixed-parenthesization doubles off the
    * exact moments, 6-dp, and the `significant` flag tests the ROUNDED
    * z against 1.96 (the house boundary-row discipline). One-sided or
    * empty groups emit null z/flag. No continuity correction (both
    * engines would apply it identically, but SciPy's default differs by
    * mode — the oracle pins the uncorrected form).
    *
    * Shape: one (group, value) count shuffle; windows on the
    * value-domain frame only. */
  def mannWhitney(df: DataFrame, valueCol: String, sampleCol: String,
      aLabel: String, bLabel: String, groupCol: String): DataFrame = {
    val ranked = rankedTwoClass(
      df.filter(col(sampleCol).isin(aLabel, bLabel)), valueCol,
      col(sampleCol) === aLabel, groupCol)
    def qd(c: Column) = c.cast("decimal(19,0)")
    val agg = ranked.groupBy("g")
      .agg(sum(col("__na")).as("n_a"), sum(col("__nb")).as("n_b"),
        sum(qd(col("__na")) * qd(col("__r2"))).cast("decimal(38,0)")
          .as("__s2a"),
        sum((qd(col("__cnt")) * qd(col("__cnt")) * qd(col("__cnt")) -
          qd(col("__cnt"))).cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("__ties"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = (col("n_a") + col("n_b")).cast("double")
    val u = (col("__s2a").cast("double") -
      na * (col("n_a") + lit(1L)).cast("double")) / lit(2.0)
    val mu = na * nb / lit(2.0)
    val variance = na * nb / lit(12.0) *
      ((n + lit(1.0)) - col("__ties").cast("double") /
        (n * (n - lit(1.0))))
    agg
      .withColumn("u", when(col("n_a") > 0L && col("n_b") > 0L,
        round(u, 6)))
      .withColumn("__var", when(col("n_a") > 0L && col("n_b") > 0L,
        variance))
      .withColumn("z", when(col("__var") > 0.0,
        round((u - mu) / sqrt(col("__var")), 6)))
      .withColumn("significant", when(col("z").isNotNull,
        abs(col("z")) > 1.96))
      .select("g", "n_a", "n_b", "u", "z", "significant")
  }

  /** Mutual information (base 2) between two categorical columns per
    * group, with marginal entropies and the normalized score
    * NMI = MI/√(H(a)·H(b)) — the information-theoretic companion of
    * [[cramersV]] (V measures χ²-style deviation from independence; MI
    * measures how many BITS one label tells you about the other, the
    * clustering-vs-labels agreement standard):
    *
    *   MI = Σ_{a,b} p(a,b)·ln( p(a,b) / (p(a)·p(b)) ) / ln 2
    *
    * Engine-exactness: all shares round to 9 dp before any ln (the
    * [[psiDrift]] discipline), the p(a)·p(b) product stays inside the
    * ln argument as one fixed-parenthesization double, each term rounds
    * to 10 dp and quantizes to DECIMAL(28,14) for order-invariant sums;
    * entropies get the same treatment on the marginal frames; ÷[[Ln2]]
    * is the compiled constant; 6-dp renders. Degenerate groups (either
    * side single-valued ⇒ H = 0) emit null NMI; MI is 0 there by
    * construction. Only OBSERVED cells contribute (0·ln 0 = 0 —
    * zero-observed grid cells contribute exactly nothing, so the dense
    * grid of [[cramersV]] is unnecessary).
    *
    * Shape: ONE map-combinable (group, a, b) cell shuffle; marginals
    * and totals join back on label-domain-sized frames. */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String,
      groupCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(groupCol).as("g"), col(aCol).cast("string").as("la"),
        col(bCol).cast("string").as("lb"))
      .groupBy("g", "la", "lb").agg(count(lit(1)).as("o"))
    val margA = cells.groupBy("g", "la").agg(sum(col("o")).as("__ra"))
    val margB = cells.groupBy("g", "lb").agg(sum(col("o")).as("__cb"))
    val perG = cells.groupBy("g").agg(sum(col("o")).as("n"))
    def share(c: Column): Column =
      round(c.cast("double") / col("n").cast("double"), 9)
    def qterm(c: Column): Column =
      round(c, 10).cast("decimal(28,14)")
    val mi = cells
      .join(margA, Seq("g", "la")).join(margB, Seq("g", "lb"))
      .join(perG, Seq("g"))
      .withColumn("__pab", share(col("o")))
      .withColumn("__pa", share(col("__ra")))
      .withColumn("__pb", share(col("__cb")))
      .groupBy("g")
      // the 9-dp share of a one-in-billions cell quantizes to exactly 0;
      // an unguarded 0·ln(0/x) is NaN, not the 0 the MI sum needs
      .agg(max(col("n")).as("n"),
        sum(qterm(when(col("__pab") > 0.0,
          col("__pab") * log(col("__pab") /
            (col("__pa") * col("__pb")))).otherwise(lit(0.0))))
          .cast("double").as("__mi"))
    def entropy(marg: DataFrame, cnt: String, out: String): DataFrame =
      marg.join(perG, Seq("g"))
        .withColumn("__p", share(col(cnt)))
        .groupBy("g")
        .agg(sum(qterm(when(col("__p") > 0.0,
          -col("__p") * log(col("__p"))).otherwise(lit(0.0))))
          .cast("double").as(out))
    val ha = entropy(margA, "__ra", "__ha")
    val hb = entropy(margB, "__cb", "__hb")
    mi.join(ha, Seq("g")).join(hb, Seq("g"))
      .select(col("g"), col("n"),
        round(col("__mi") / lit(Ln2), 6).as("mi"),
        round(col("__ha") / lit(Ln2), 6).as("h_a"),
        round(col("__hb") / lit(Ln2), 6).as("h_b"),
        when(col("__ha") > 0.0 && col("__hb") > 0.0,
          round(col("__mi") / (sqrt(col("__ha")) * sqrt(col("__hb"))), 6))
          .as("nmi"))
  }

  /** Equal-frequency (quantile) discretization per group — the feature-
    * engineering staple that makes skewed numerics model-ready and
    * histogram bins population-balanced (the equal-WIDTH complement is
    * [[histogram]]). Each row's bin is a PURE INTEGER function of its
    * group's ECDF:
    *
    *   bin(v) = ⌊ countBelow(v) · k / n ⌋      ∈ [0, k−1]
    *
    * — ties share a bin by construction, the result is independent of
    * partitioning and engine (no floating percentile, no interpolation
    * convention, no IEEE step anywhere), and countBelow < n bounds the
    * bin at k−1 with no clamp. Matches ntile() when values are
    * distinct; under ties it is the deterministic value-keyed variant
    * (ntile splits tied rows arbitrarily — unacceptable for a
    * reproducible feature).
    *
    * Shape: the [[percentRankNormalize]] machinery — one (group, value)
    * count shuffle, a cumulative window over the value-domain summary
    * frame, join back on (group, value). Null values are excluded
    * (documented; a null is not a quantile). */
  def equalFreqBins(df: DataFrame, idCol: String, valueCol: String,
      groupCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col("__bg")).orderBy(col("__bv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("__bg"))
    val bins = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__bg"),
        col(valueCol).cast("double").as("__bv"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", max(col("__cum")).over(tot))
      .withColumn("bin",
        expr(s"((__cum - __c) * ${k}L) div __n"))
      .select(col("__bg"), col("__bv"), col("bin"))
    df.filter(col(valueCol).isNotNull)
      .select(col(idCol), col(groupCol),
        col(valueCol).cast("double").as("v"))
      .join(bins, col(groupCol) <=> col("__bg") &&
        col("v") === col("__bv"))
      .select(col(idCol), col(groupCol), col("v"), col("bin"))
  }

  /** Leave-one-out target encoding — the high-cardinality categorical →
    * numeric encoding that avoids the self-leakage of a plain
    * per-category mean (a category's own row must not see its own
    * target; with it, the encoding memorizes the label and the model
    * overfits on sight):
    *
    *   enc(i) = (Σ_cat y − yᵢ) / (n_cat − 1)
    *   singletons (n_cat = 1) → the global LOO prior (Σ y − yᵢ)/(N − 1)
    *
    * Exactness: targets quantize to DECIMAL(14,2) on entry, category
    * and global sums are exact DECIMAL(28,2) (map-combinable, one
    * shuffle), each encoding is ONE IEEE division of exact numerators,
    * 6-dp render. N = 1 degenerates to null.
    *
    * Shape: one category-count shuffle broadcast back onto a
    * zero-shuffle scoring scan (the [[zscoreFlags]] shape); the global
    * total rides a broadcast 1-row frame — no driver action. */
  def targetEncodeLoo(df: DataFrame, idCol: String, categoryCol: String,
      targetCol: String): DataFrame = {
    val yq = col(targetCol).cast("decimal(14,2)")
    val base = df
      .filter(col(categoryCol).isNotNull && col(targetCol).isNotNull)
      .select(col(idCol), col(categoryCol).as("cat"), yq.as("__y"))
    val catSums = base.groupBy(col("cat").as("__ec"))
      .agg(count(lit(1)).as("__cn"),
        sum(col("__y")).cast("decimal(28,2)").as("__cs"))
    val global = base.agg(count(lit(1)).as("__gn"),
      sum(col("__y")).cast("decimal(28,2)").as("__gs"))
    base
      .join(broadcast(catSums), col("cat") === col("__ec"))
      .crossJoin(broadcast(global))
      .withColumn("enc",
        when(col("__cn") > 1L,
          round((col("__cs").cast("double") - col("__y").cast("double")) /
            (col("__cn") - lit(1L)).cast("double"), 6))
        .when(col("__gn") > 1L,
          round((col("__gs").cast("double") - col("__y").cast("double")) /
            (col("__gn") - lit(1L)).cast("double"), 6)))
      .select(col(idCol), col("cat"),
        col("__y").cast("double").as("y"), col("enc"))
  }

  /** Decile (k-cile) lift/gain table per group — the campaign-targeting
    * readout every scored-population report opens with: bucket the
    * population by score DESCENDING into k equal-frequency bins
    * ([[equalFreqBins]]'s integer arithmetic on the reversed ECDF),
    * then per bucket the response rate, the cumulative capture of all
    * positives (the gain curve), and lift = bucket rate / base rate.
    * AUC ([[aucRoc]]) summarizes the same ranking in one number; the
    * lift table is its operational form ("mail the top 2 deciles").
    *
    * Exactness: buckets are pure integer ECDF arithmetic (ties share a
    * bucket — deterministic, partition-invariant); rates and lift are
    * single IEEE divisions of exact counts with fixed parenthesization,
    * 6-dp. Groups with zero positives emit null capture/lift.
    *
    * Shape: one (group, score) count shuffle; the cumulative windows
    * ride first the score-domain frame, then the k-row bucket frame. */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
      groupCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val wDesc = Window.partitionBy(col("g")).orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("g"))
    val wBuckets = Window.partitionBy(col("g")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(groupCol).as("g"), col(scoreCol).cast("double").as("v"),
        col(labelCol).cast("boolean").as("y"))
      .groupBy("g", "v")
      .agg(count(lit(1)).as("__c"),
        sum(when(col("y"), 1L).otherwise(0L)).as("__p"))
      .withColumn("__cum", sum(col("__c")).over(wDesc))
      .withColumn("__n", max(col("__cum")).over(tot))
      .withColumn("bucket", expr(s"((__cum - __c) * ${k}L) div __n"))
      .groupBy("g", "bucket")
      .agg(sum(col("__c")).as("n"), sum(col("__p")).as("n_pos"))
      .withColumn("__tn", sum(col("n")).over(tot))
      .withColumn("__tp", sum(col("n_pos")).over(tot))
      .withColumn("__cp", sum(col("n_pos")).over(wBuckets))
      .select(col("g"), col("bucket"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("rate"),
        when(col("__tp") > 0L,
          round(col("__cp").cast("double") / col("__tp").cast("double"), 6))
          .as("cum_capture"),
        when(col("__tp") > 0L,
          round((col("n_pos").cast("double") / col("n").cast("double")) /
            (col("__tp").cast("double") / col("__tn").cast("double")), 6))
          .as("lift"))
  }

  /** Decision-STUMP feature screening — for each numeric feature, the
    * single split threshold minimizing weighted Gini impurity against a
    * boolean label, with the parent impurity and the gain (the fastest
    * honest answer to "which of these hundred columns actually separates
    * the classes?" — a correlation matrix only sees LINEAR signal; a
    * stump sees any monotone-thresholdable one, and the output ranks
    * features exactly the way a tree's root split would):
    *
    *   gini(p) = 1 − (p² + (1−p)²),
    *   split(t) = (n_L/n)·gini(p_L) + (n_R/n)·gini(p_R),  L = {x ≤ t}
    *
    * Exactness: every candidate threshold is an OBSERVED value off the
    * feature's (feature, value) count frame — cumulative counts give
    * n_L/pos_L exactly, each candidate's impurity is one
    * fixed-parenthesization double chain rounded to 9 dp BEFORE the
    * argmin (ties → smallest threshold via struct-min), gain off the
    * 9-dp parent/split pair at 6 dp. Single-valued features emit null.
    *
    * Shape: the feature melt is one explode-of-struct-array scan (ONE
    * pass over the table for all features), one (feature, value) count
    * shuffle, cumulative windows on the value-domain frame, one
    * struct-min aggregation per feature. */
  def bestSplit(df: DataFrame, featureCols: Seq[String],
      labelCol: String): DataFrame = {
    require(featureCols.nonEmpty, "bestSplit: need at least one feature")
    // the feature melt amplifies every row #features x in the scan
    // stage — spread it when the input is a one-row-group file (§2.5)
    val melted = graft.ops.Pipeline.cpuRebalance(
        df.select((labelCol +: featureCols).distinct.map(col): _*))
      .filter(col(labelCol).isNotNull)
      .select(col(labelCol).cast("boolean").as("__y"),
        explode(array(featureCols.map(f =>
          struct(lit(f).as("feature"),
            col(f).cast("double").as("v"))): _*)).as("__fv"))
      .select(col("__fv.feature").as("feature"), col("__fv.v").as("v"),
        col("__y"))
      .filter(col("v").isNotNull)
    // (feature, value)-cell frame, MATERIALIZED: it feeds the prefix-sum
    // pass (whose plan-build-time quantile sketch is itself an action),
    // the per-feature totals, and the parent-gini aggregation — without
    // the checkpoint each consumer re-runs the melt scan.
    val cells = melted.groupBy("feature", "v")
      .agg(count(lit(1)).as("__c"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__p"))
      .localCheckpoint()
    // per-feature totals once (they double as the parent-gini counts)
    val totals = cells.groupBy("feature")
      .agg(sum(col("__c")).as("n"), sum(col("__p")).as("n_pos"))
      .localCheckpoint()
    // cumulative counts via the DISTRIBUTED bucketed prefix sum
    // (Pipeline.runningSumN) instead of one window task per feature —
    // the former per-feature value-domain window was this operator's
    // scale ceiling (round-15 verdict item 7; round-16 audit: 3 busy
    // tasks of a 32-task stage, max/median 10.8). Both prefix columns
    // share one pass; value-domain buckets come from the plan-build
    // quantile sketch over the checkpointed cells.
    val cum = Pipeline.runningSumN(cells, "v",
        Seq(col("__c") -> "__cn", col("__p") -> "__cp"),
        buckets = 32, partCols = Seq("feature"))
      .join(broadcast(totals.select(col("feature"),
        col("n").as("__n"), col("n_pos").as("__np"))), Seq("feature"))
    def d(c: Column) = c.cast("double")
    def gini(p: Column) =
      lit(1.0) - (p * p + (lit(1.0) - p) * (lit(1.0) - p))
    val pL = d(col("__cp")) / d(col("__cn"))
    val pR = d(col("__np") - col("__cp")) / d(col("__n") - col("__cn"))
    val split = d(col("__cn")) / d(col("__n")) * gini(pL) +
      d(col("__n") - col("__cn")) / d(col("__n")) * gini(pR)
    val best = cum.filter(col("__cn") < col("__n"))
      .withColumn("__g9", round(split, 9))
      .groupBy("feature")
      .agg(min(struct(col("__g9"), col("v"))).as("__b"))
      .select(col("feature"), col("__b.__g9").as("__bg"),
        col("__b.v").as("best_threshold"))
    val parents = totals
      .withColumn("__gp",
        round(gini(d(col("n_pos")) / d(col("n"))), 9))
    // one row per feature — materialize so a caller's orderBy sampling
    // cannot re-run the per-feature window passes (round-15 audit: the
    // window stage executed twice)
    parents.join(best, Seq("feature"), "left")
      .select(col("feature"), col("n"), col("n_pos"),
        col("best_threshold"),
        round(col("__gp"), 6).as("gini_parent"),
        round(col("__bg"), 6).as("gini_split"),
        round(col("__gp") - col("__bg"), 6).as("gain"))
      .localCheckpoint()
  }

  /** CUPED variance-reduced metric adjustment (Deng et al. 2013 —
    * "Improving the Sensitivity of Online Controlled Experiments") —
    * the standard pre-period covariate trick that cuts an A/B metric's
    * variance by its pre/post correlation² without biasing the
    * treatment effect:
    *
    *   y_adj = y − θ·(x − x̄),   θ = cov(x,y)/var(x)   (per group)
    *
    * Exactness: x/y quantize to DECIMAL(14,2), θ comes from the
    * [[linearFit]] exact-DECIMAL(38,4) moment chain (one fixed-
    * parenthesization double), x̄ = sx/n one division; the per-row
    * adjustment is one double chain at 6 dp. Zero-x-variance groups
    * null θ and pass y through UNADJUSTED (no signal, no adjustment —
    * the honest fallback). Also emits rho2 = corr², the fraction of
    * variance removed.
    *
    * Shape: one map-combinable moment shuffle per group, the tiny
    * (group, θ, x̄) frame broadcast back onto a zero-shuffle scoring
    * scan. */
  def cupedAdjust(df: DataFrame, idCol: String, metricCol: String,
      covariateCol: String, groupCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      col(metricCol).cast("decimal(14,2)").as("y"),
      col(covariateCol).cast("decimal(14,2)").as("x"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val m = base.groupBy("g").agg(
      count(lit(1)).as("__n"),
      sum(col("x")).cast("decimal(38,2)").as("__sx"),
      sum(col("y")).cast("decimal(38,2)").as("__sy"),
      sum(col("x") * col("x")).cast("decimal(38,4)").as("__sxx"),
      sum(col("y") * col("y")).cast("decimal(38,4)").as("__syy"),
      sum(col("x") * col("y")).cast("decimal(38,4)").as("__sxy"))
    def d(c: Column) = c.cast("double")
    val n = d(col("__n"))
    val num = n * d(col("__sxy")) - d(col("__sx")) * d(col("__sy"))
    val denX = n * d(col("__sxx")) - d(col("__sx")) * d(col("__sx"))
    val denY = n * d(col("__syy")) - d(col("__sy")) * d(col("__sy"))
    val params = m.select(col("g"),
      when(col("__n") >= 2L && denX > 0.0, num / denX).as("__theta"),
      (d(col("__sx")) / n).as("__xbar"),
      when(col("__n") >= 2L && denX > 0.0 && denY > 0.0,
        round(num * num / (denX * denY), 6)).as("rho2"))
    base.join(broadcast(params), Seq("g"))
      .select(col("g"), col("id"),
        d(col("y")).as("y"), d(col("x")).as("x"),
        round(col("__theta"), 6).as("theta"), col("rho2"),
        when(col("__theta").isNotNull,
          round(d(col("y")) - col("__theta") *
            (d(col("x")) - col("__xbar")), 6))
          .otherwise(d(col("y"))).as("y_adj"))
  }

  /** Cumulative Poisson(1) thresholds P(K ≤ k) for k = 0..5, rounded to
    * 12 dp — the compiled constants of [[bootstrapCI]]'s weight draw,
    * shared textually with the oracle (the sprtConstants discipline).
    * Draws above the last threshold cap at k = 6 (P ≈ 5.9e-5). */
  val Poisson1Cdf: Seq[Double] = {
    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val e1 = math.exp(-1.0)
    (0 to 5).map(k =>
      r12((0 to k).map(j =>
        e1 / (1 to j).foldLeft(1.0)(_ * _)).sum))
  }

  /** POISSON BOOTSTRAP confidence interval for a per-group mean (the
    * at-scale bootstrap standard — classic resampling needs n draws per
    * replicate coordinated across the cluster; giving every row an
    * independent Poisson(1) weight per replicate is one scan, and the
    * replicate totals converge to the same distribution): per replicate
    * r, weight(row) = Poisson⁻¹(u) with u the md5 uniform of (id#r) —
    * never rand(), stable under retries, replayable by the oracle's
    * md5-Horner fold — then
    *
    *   CI = [picked 2.5%, picked 97.5%] of the replicate means,
    *
    * PICKED existing values off the replicate-mean ECDF (the
    * [[robustScale]] cut discipline — no interpolation convention), and
    * the bootstrap SE as the honesty column beside the parametric
    * s/√n every dashboard already shows.
    *
    * Exactness: values quantize to DECIMAL(14,2), weighted sums are
    * exact (integer weights × decimal values), replicate means round to
    * 9 dp before the ECDF and the SE moments (exact DECIMAL(18,9)
    * squares); 6-dp renders. All-zero-weight replicates drop (counted
    * in b_used). Shape: the replicate explosion map-combines to
    * (group, rep) cells before the ONE shuffle — work deliberately
    * linear·b — and the unweighted n/mean ride the SAME scan as a
    * sentinel replicate (weight 1 per row), so the source is read once;
    * the CI picks, SE moments and n/mean all re-read the one reused
    * cell exchange.
    *
    * Hash economics: one md5 serves SIX replicates — the 60-bit value
    * slices into six 10-bit uniforms u = (slice + 0.5)/1024 (replicate
    * r uses hash ⌊r/6⌋, slice r mod 6), cutting the dominant per-row
    * md5 cost 6× (measured 21 s → ~6 s at sf0.1, b=100). The 10-bit
    * granularity moves each Poisson class probability by < 6e-4 —
    * immaterial for a bootstrap, pinned by the oracle replaying the
    * identical slice arithmetic.
    *
    * Lifecycle: the (group, replicate) cell frame is pinned with a LAZY
    * `localCheckpoint(eager = false)` — constructing the returned
    * DataFrame runs no Spark job; the heavy replicate scan materializes
    * once at the caller's first action and is reused by the CI picks,
    * SE moments and n/mean subtrees. The checkpoint is non-reliable
    * (executor-local blocks): an executor loss during the consuming job
    * fails that job and the caller re-runs it — acceptable for a batch
    * statistic, by design. Blocks are released by the ContextCleaner
    * once the frame is unreferenced; callers looping over many
    * bootstrapCI frames should let each result go out of scope between
    * iterations rather than accumulating live references. */
  def bootstrapCI(df: DataFrame, idCol: String, valueCol: String,
      groupCol: String, b: Int = 200, salt: String = "boot"): DataFrame = {
    require(b >= 4, s"b must be >= 4, got $b")
    val base = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(idCol).cast("string").as("id"),
        col(valueCol).cast("decimal(14,2)").as("v"))
    val slice = (0 to 5).foldLeft(lit(0L)) { (acc, j) =>
      when(col("__j") === j,
        pmod(shiftright(col("__hv"), 10 * j), lit(1024L))).otherwise(acc)
    }
    val u = (col("__slice").cast("double") + lit(0.5)) / lit(1024.0)
    val k = Poisson1Cdf.zipWithIndex.foldRight(lit(6L)) {
      case ((t, i), acc) => when(u < lit(t), lit(i.toLong)).otherwise(acc)
    }
    val nHashes = (b + 5) / 6
    // ONE scan for replicates AND the unweighted n/mean: hash index -1 is
    // the SENTINEL replicate (__r = -6, weight exactly 1 per row, no md5)
    // whose cell IS the full-sample aggregate — folding what was a second
    // base scan + groupBy into the same (g, replicate) exchange (the
    // round-12 A/B regression: the degenerate-group left-join surface
    // re-derived n/mean from a separate scan of the source).
    // REBALANCED first: the explode amplifies every row ~(b+1)× with an
    // md5 each INSIDE the scan stage, so the split policy (not the data)
    // sets the parallelism — a 2 MB source file ran the whole replicate
    // scan in ONE task.
    val cells = base
      .repartition(Pipeline.cpuWidth(base))
      .select(col("g"), col("id"), col("v"),
        explode(sequence(lit(-1), lit(nHashes - 1))).as("__h"))
      .withColumn("__hv", when(col("__h") >= 0, graft.ops.Pipeline.md5Long60(
        concat(col("id"), lit("#"), col("__h").cast("string")), salt))
        .otherwise(lit(0L)))
      .select(col("g"), col("v"), col("__h"), col("__hv"),
        explode(sequence(lit(0), lit(5))).as("__j"))
      .withColumn("__r", col("__h") * 6 + col("__j"))
      .filter(col("__r") === -6 || (col("__r") >= 0 && col("__r") < b))
      .withColumn("__slice", slice)
      .withColumn("__k", when(col("__r") === -6, lit(1L)).otherwise(k))
      .groupBy("g", "__r")
      .agg(sum(col("__k")).as("__sw"),
        sum(col("__k").cast("decimal(19,0)") * col("v"))
          .cast("decimal(38,2)").as("__swv"))
      // MATERIALIZED: the three consumers below filter on the grouping
      // key __r, and those filters push through the aggregation into the
      // replicate scan — splitting one reusable cell exchange into
      // divergent subtrees that each re-run the b-replicate md5 explode
      // (measured: the split cost more than the second base scan it
      // replaced). The cell frame is groups×(b+1) rows — checkpointing
      // it pins exactly ONE heavy scan regardless of optimizer choices.
      // LAZY so that building the plan runs no job (see scaladoc).
      .localCheckpoint(eager = false)
    val full = cells.filter(col("__r") === -6)
      .select(col("g"), col("__sw").as("n"),
        round(col("__swv").cast("double") / col("__sw").cast("double"), 6)
          .as("mean"))
    val reps = cells.filter(col("__r") >= 0)
      .withColumn("__m", when(col("__sw") > 0L,
        round(col("__swv").cast("double") / col("__sw").cast("double"),
          9)))
      .filter(col("__m").isNotNull)
    val wEcdf = Window.partitionBy(col("g")).orderBy(col("__m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = reps.groupBy("g", "__m").agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wEcdf))
      .withColumn("__bu",
        max(col("__cum")).over(Window.partitionBy(col("g"))))
    def pick(q: Double, name: String): DataFrame = cum
      .filter(col("__cum") >= greatest(lit(1L),
        ceil(lit(q) * col("__bu")).cast("long")))
      .groupBy("g").agg(min(col("__m")).as(name))
    val se = reps
      .select(col("g"), col("__m").cast("decimal(18,9)").as("__mq"))
      .groupBy("g").agg(count(lit(1)).as("b_used"),
        sum(col("__mq")).cast("decimal(38,9)").as("__sm"),
        sum((col("__mq") * col("__mq")).cast("decimal(38,18)"))
          .cast("decimal(38,18)").as("__sm2"))
    def d(c: Column) = c.cast("double")
    val varB = (d(col("__sm2")) - d(col("__sm")) * d(col("__sm")) /
      d(col("b_used"))) / (d(col("b_used")) - lit(1.0))
    // LEFT joins: a group whose every replicate degenerates (all-zero
    // weights — plausible for 1–2 row groups) must still surface with
    // its n/mean and b_used = 0, null CI — not vanish from the output.
    // Every join side derives from the ONE (g, replicate) exchange
    // (reused), and the summary frames are group-sized → broadcast.
    full
      .join(broadcast(se), Seq("g"), "left")
      .join(broadcast(pick(0.025, "boot_lo")), Seq("g"), "left")
      .join(broadcast(pick(0.975, "boot_hi")), Seq("g"), "left")
      .select(col("g"), col("n"), col("mean"),
        coalesce(col("b_used"), lit(0L)).as("b_used"),
        col("boot_lo"), col("boot_hi"),
        when(col("b_used") >= 2L && varB >= 0.0,
          round(sqrt(varB), 6)).as("boot_se"))
  }

  /** REFERENTIAL-INTEGRITY audit between a child and a parent table —
    * the join-health check a pipeline runs BEFORE trusting any
    * child⋈parent join (orphan child rows silently vanish from inner
    * joins and silently null from left joins; duplicate parent keys
    * silently FAN OUT every matching child row — both corrupt
    * downstream aggregates without erroring): one row reporting child
    * volume, null-key rows, orphan rows/keys + share, the `exemplars`
    * lexicographically-smallest orphan keys (comma-joined; empty →
    * null, the cross-engine empty-string discipline), and the parent's
    * key-uniqueness profile (duplicate keys, max multiplicity).
    *
    * Shape: one count shuffle per side, a key-frame anti-join for
    * orphans, a distributed top-k for the exemplars; all reductions
    * meet as broadcast 1-row frames. Keys compare as STRINGS (casts
    * pinned on both engines). */
  def integrityAudit(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      exemplars: Int = 5): DataFrame = {
    require(exemplars >= 1, s"exemplars must be >= 1, got $exemplars")
    val ck = child.select(col(childKey).cast("string").as("k"))
    val childAgg = ck.agg(count(lit(1)).as("n_child_rows"),
      sum(when(col("k").isNull, 1L).otherwise(0L))
        .as("n_child_null_keys"))
    val childKeys = ck.filter(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("__c"))
    val pkeys = parent
      .select(col(parentKey).cast("string").as("k"))
      .filter(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("__pc"))
    val orphans = Dedup.materializeBase(
      childKeys.join(pkeys, Seq("k"), "left_anti"), None)
    val orphanAgg = orphans.agg(
      coalesce(sum(col("__c")), lit(0L)).as("n_orphan_rows"),
      count(lit(1)).as("n_orphan_keys"))
    val ex = orphans.orderBy("k").limit(exemplars)
      .agg(array_join(sort_array(collect_list(col("k"))), ",")
        .as("__ex"))
      .select(when(length(col("__ex")) > 0, col("__ex"))
        .as("example_orphans"))
    val parentAgg = pkeys.agg(
      coalesce(sum(col("__pc")), lit(0L)).as("n_parent_rows"),
      count(lit(1)).as("n_parent_keys"),
      sum(when(col("__pc") > 1L, 1L).otherwise(0L))
        .as("n_dup_parent_keys"),
      coalesce(max(col("__pc")), lit(0L))
        .as("max_parent_multiplicity"))
    childAgg.crossJoin(broadcast(orphanAgg)).crossJoin(broadcast(ex))
      .crossJoin(broadcast(parentAgg))
      .withColumn("orphan_share", when(col("n_child_rows") > 0L,
        round(col("n_orphan_rows").cast("double") /
          col("n_child_rows").cast("double"), 6)))
      .select("n_child_rows", "n_child_null_keys", "n_orphan_rows",
        "n_orphan_keys", "orphan_share", "example_orphans",
        "n_parent_rows", "n_parent_keys", "n_dup_parent_keys",
        "max_parent_multiplicity")
  }

  /** 1/√(2π) — compiled constant of the normal density, shared textually
    * with every oracle that re-derives [[normalTwoSidedP]]. */
  val InvSqrt2Pi: Double = 0.3989422804014327

  /** Two-sided normal tail probability p = 2·P(Z > |z|) via the
    * Abramowitz & Stegun 26.2.17 polynomial (|abs error| < 7.5e-8 — two
    * orders below the 9-dp render). Public formula, elementary ops only
    * (exp, one Horner chain), so both engines fold the identical double
    * expression; the result rounds to NINE dp at the source — the house
    * pre-ln/exp discipline — so every consumer ([[bhFdr]] ranks, the
    * oracle hash) sees the same quantized p. */
  def normalTwoSidedP(z: Column): Column = {
    val az = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) +
        t * lit(1.330274429)))))
    // Clamp to 1.0: near z=0 the polynomial's |error| ≤ 7.5e-8 can land
    // marginally ABOVE 1 (doubled by the two-sided factor) — a contract
    // wart for consumers expecting p ∈ [0,1]. Clamp AFTER the 9-dp
    // round, mirrored textually in every oracle that re-derives this.
    least(lit(1.0),
      round(lit(2.0) * (lit(InvSqrt2Pi) * exp(az * az / lit(-2.0)) * poly),
        9))
  }

  /** Benjamini–Hochberg step-up FDR correction over a FAMILY of tests —
    * the multiple-comparisons stage every metrics platform needs the
    * moment it runs one test per segment (at α=0.05, fifty segments
    * yield ~2.5 false "wins" by construction; controlling the FALSE
    * DISCOVERY RATE instead of the per-test error is the standard fix
    * that doesn't Bonferroni-kill all power):
    *
    *   q(i) = min_{j ≥ i} ( p(j) · m / j ),  reject ⇔ q ≤ α
    *
    * Exactness: ranks come from the p-DOMAIN cumulative count (ties
    * share the block's HIGHEST index — the classical sorted-index
    * convention, since the running min hands every member of a tied
    * block the same q); p·m/j is one fixed-parenthesization double per
    * distinct p; the running min is over the p-domain summary frame,
    * never raw tests; the discovery flag fires on the UNROUNDED q
    * (6-dp render). Callers feed p already 9-dp quantized (e.g.
    * [[normalTwoSidedP]]) so cross-engine ulps cannot reorder ranks.
    *
    * Shape: one (family, p) count shuffle; windows ride the p-domain
    * frame; tests join their q back by (family, p). */
  def bhFdr(df: DataFrame, idCol: String, pCol: String,
      familyCol: String, alpha: Double = 0.05): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"need 0 < alpha < 1, got $alpha")
    val base = df
      .select(col(familyCol).as("fam"), col(idCol).as("test_id"),
        col(pCol).cast("double").as("p"))
      .filter(col("p").isNotNull)
    val dom = base.groupBy("fam", "p").agg(count(lit(1)).as("__c"))
    val wAsc = Window.partitionBy(col("fam")).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(col("fam")).orderBy(col("p").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = dom
      .withColumn("rank", sum(col("__c")).over(wAsc))
      .withColumn("m",
        max(col("rank")).over(Window.partitionBy(col("fam"))))
      .withColumn("__raw", col("p") * col("m").cast("double") /
        col("rank").cast("double"))
      .withColumn("__q", least(lit(1.0), min(col("__raw")).over(wDesc)))
    base
      .join(ranked.select("fam", "p", "rank", "m", "__q"), Seq("fam", "p"))
      .select(col("fam"), col("test_id"), col("p"), col("m"), col("rank"),
        round(col("__q"), 6).as("q_value"),
        (col("__q") <= lit(alpha)).as("discovery"))
  }

  /** Monte-Carlo RANDOMIZATION test of a two-arm mean difference per
    * group — the distribution-free p the Welch t of
    * [[graft.ops.Behavior.abTestStats]] approximates (exact under
    * exchangeability, no normality or large-n assumption — the honest
    * readout for skewed revenue-like metrics): the observed meanA−meanB
    * is compared against `b` null replicates in which every row's arm is
    * re-drawn as a deterministic md5 coin MATCHED TO THE OBSERVED
    * ALLOCATION — side A iff the 60-bit md5 uniform of (id#rep) falls
    * below n_a/n, compared as the exact integer cross-product
    * md5·n < n_a·2⁶⁰ (DECIMAL both engines; no division, no doubles) —
    * so arm sizes are Binomial(n, n_a/n) per replicate (random
    * RELABELING, not fixed-margin permutation; documented). A fair
    * P=1/2 coin would be anti-conservative for unequal allocations (a
    * 90/10 experiment's null diffs would carry var ≈ 4σ²/n instead of
    * the true σ²(1/n_a+1/n_b) — ~2.5× understated spread, an error
    * that does NOT shrink with n); matching the coin to n_a/n restores
    * the random-relabeling null at every allocation, and
    *
    *   p = (1 + #{ replicates with |diff| ≥ |observed| }) / (b + 1)
    *
    * — the add-one form that never reports p = 0.
    *
    * Determinism/exactness: the coin compares md5Long60(id # rep)
    * against the allocation threshold — never rand(), stable under
    * retries and replicable by the oracle's
    * md5-Horner fold; values quantize to DECIMAL(14,2), per-(group,
    * rep, side) sums are exact, each diff is one fixed-parenthesization
    * double rounded to 9 dp BEFORE the ≥ comparison (both sides), p is
    * one exact-integer division rounded at 6.
    *
    * Shape: the replicate explosion is transform-then-explode over a
    * compiled `sequence(0, b−1)` — b·rows md5 evaluations, map-side
    * combined into ≤ groups·b·2 cells before the ONE shuffle; the
    * observed frame is a second map-combinable aggregation. Work is
    * deliberately linear·b — size `b` to the evidence you need. */
  def permutationTest(df: DataFrame, idCol: String, valueCol: String,
      armCol: String, aLabel: String, bLabel: String, groupCol: String,
      b: Int = 100, salt: String = "perm"): DataFrame = {
    require(b >= 1, s"b must be >= 1, got $b")
    // rebalance the scan: the b-way replicate explode + md5 coin is
    // CPU-dense and the input is a one-row-group parquet at gate scale
    // (round-15 stage audit: one 6.9 s task; guide §2.5) — at 100 TB
    // the scan has enough natural splits and cpuRebalance is a no-op
    val base = graft.ops.Pipeline.cpuRebalance(df, col(idCol))
      .filter(col(armCol).isin(aLabel, bLabel) &&
        col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(idCol).cast("string").as("id"),
        col(valueCol).cast("decimal(14,2)").as("v"),
        (col(armCol) === aLabel).as("__ina"))
    def meanDiff(s0: Column, n0: Column, s1: Column, n1: Column): Column =
      round(s0.cast("double") / n0.cast("double") -
        s1.cast("double") / n1.cast("double"), 9)
    val obs = base.groupBy("g").agg(
      sum(when(col("__ina"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__ina"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__ina"), col("v"))).cast("decimal(38,2)").as("__sa"),
      sum(when(!col("__ina"), col("v"))).cast("decimal(38,2)").as("__sb"))
      .withColumn("__obs", when(col("n_a") > 0L && col("n_b") > 0L,
        meanDiff(col("__sa"), col("n_a"), col("__sb"), col("n_b"))))
    // allocation-matched coin: side A iff md5 < n_a/n, as the exact
    // integer cross-product md5·n < n_a·2⁶⁰ (DECIMAL(19,0) products —
    // exact to n ~ 1e12 rows per group; the oracle replays the same
    // HUGEINT arithmetic). The per-group (n_a, n) frame is tiny
    // (one row per group) — broadcast.
    val alloc = obs.select(col("g"), col("n_a").as("__qa"),
      (col("n_a") + col("n_b")).as("__qn"))
    val reps = base
      .join(broadcast(alloc), Seq("g"))
      .select(col("g"), col("id"), col("v"), col("__qa"), col("__qn"),
        explode(sequence(lit(0), lit(b - 1))).as("__r"))
      .withColumn("__side",
        when(graft.ops.Pipeline.md5Long60(
            concat(col("id"), lit("#"), col("__r").cast("string")), salt)
            .cast("decimal(19,0)") * col("__qn").cast("decimal(19,0)") <
          col("__qa").cast("decimal(19,0)") *
            lit(1152921504606846976L).cast("decimal(19,0)"), 0L)
          .otherwise(1L))
      .groupBy("g", "__r")
      .agg(sum(when(col("__side") === 0L, 1L).otherwise(0L)).as("__n0"),
        sum(when(col("__side") =!= 0L, 1L).otherwise(0L)).as("__n1"),
        sum(when(col("__side") === 0L, col("v"))).cast("decimal(38,2)")
          .as("__s0"),
        sum(when(col("__side") =!= 0L, col("v"))).cast("decimal(38,2)")
          .as("__s1"))
      .withColumn("__d", when(col("__n0") > 0L && col("__n1") > 0L,
        meanDiff(col("__s0"), col("__n0"), col("__s1"), col("__n1"))))
    val exceed = reps
      .join(obs.select(col("g"), col("__obs")), Seq("g"))
      .groupBy("g")
      .agg(sum(when(col("__d").isNotNull, 1L).otherwise(0L)).as("b_used"),
        sum(when(col("__d").isNotNull && col("__obs").isNotNull &&
          abs(col("__d")) >= abs(col("__obs")), 1L).otherwise(0L))
          .as("n_ge"))
    obs
      .join(exceed, Seq("g"), "left")
      .select(col("g"), col("n_a"), col("n_b"),
        round(col("__obs"), 6).as("obs_diff"),
        coalesce(col("b_used"), lit(0L)).as("b_used"),
        coalesce(col("n_ge"), lit(0L)).as("n_ge"),
        when(col("__obs").isNotNull && col("b_used") > 0L,
          round((lit(1L) + col("n_ge")).cast("double") /
            (col("b_used") + lit(1L)).cast("double"), 6)).as("p_perm"))
  }

  /** Exact WEIGHTED lower quantiles per group — "the token-weighted
    * median document length", the data-card statistic every corpus
    * report quotes, where each row counts with an integer weight (token
    * count, byte count, dedup-cluster size) instead of once. The
    * unweighted `percentile` answers "the middle DOCUMENT"; this answers
    * "the document the middle TOKEN lives in" — on a corpus where a few
    * giant docs carry most tokens, the two disagree wildly.
    *
    * q is a RATIONAL num/den pair and the answer is the smallest value v
    * with cumWeight(v)·den ≥ num·totalWeight — a pure INTEGER
    * cross-multiplication picking an EXISTING value (never an
    * interpolation convention, no IEEE anywhere), so any engine
    * reproduces it bit-for-bit. Weights are cast to long: integer
    * weights are the exactness contract; null/≤0-weight and null-value
    * rows are excluded by documented convention.
    *
    * Shape at scale: one map-combined (group, value) count exchange
    * collapses the corpus to groups×distinct-values cells, the
    * cumulative sum runs per-group over CELLS (the window sorts a
    * group's distinct values, never its rows — the [[bootstrapCI]] ECDF
    * discipline), and the cell frame is lazily checkpointed so the |qs|
    * pick filters share ONE exchange instead of re-scanning the corpus
    * per quantile. */
  def weightedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String,
      qs: Seq[(Int, Int)] = Seq((1, 4), (1, 2), (3, 4))): DataFrame = {
    require(qs.nonEmpty, "qs must not be empty")
    qs.foreach { case (n, d) =>
      require(n >= 1 && n <= d, s"q must be in (0,1]: got $n/$d") }
    val base = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .select(col(groupCol).as("grp"),
        col(valueCol).cast("decimal(14,2)").as("v"),
        col(weightCol).cast("long").as("w"))
    val wEcdf = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = base.groupBy("grp", "v").agg(sum(col("w")).as("cw"))
      .withColumn("cum", sum(col("cw")).over(wEcdf))
      .withColumn("tw",
        max(col("cum")).over(Window.partitionBy(col("grp"))))
      .localCheckpoint(eager = false)
    qs.map { case (n, d) =>
      cum.filter(col("cum") * d >= col("tw") * n)
        .groupBy("grp")
        .agg(min(col("v")).cast("double").as("wq"),
          min(col("tw")).as("total_w"))
        .withColumn("q", lit(s"$n/$d"))
        .select(col("grp"), col("q"), col("wq"), col("total_w"))
    }.reduce(_ unionByName _)
  }
}

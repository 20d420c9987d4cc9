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
    df.select(col(idCol), col(groupCol), col(valueCol))
      .join(withN, Seq(groupCol, valueCol))
      .select(col(idCol), col(groupCol), col(valueCol), col("pr"))
  }
}

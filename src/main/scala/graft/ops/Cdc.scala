package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture application — the MERGE INTO / upsert primitive a
  * snapshot-maintained corpus needs: apply a batch of keyed
  * insert/update/delete changes onto the current snapshot and emit the
  * next snapshot.
  *
  * Semantics (the lakehouse-merge contract):
  *  - a change row wins over the snapshot row with the same key;
  *  - 'D' deletes the key, 'U'/'I' replace/insert the payload (an 'U'
  *    without a matching snapshot row still lands — upsert, and an 'I'
  *    over an existing key replaces it — idempotent replay);
  *  - when `seqCol` is given, only each key's HIGHEST-sequence change
  *    applies (out-of-order CDC delivery), ties broken by the operation
  *    itself being unique per (key, seq) — enforced with an in-plan
  *    guard, because silently picking one of two same-seq ops is how
  *    replicas diverge.
  *
  * Scale shape: one arg_max-style reduction over the change batch (map-
  * combinable struct max on (seq)), then ONE equi-shuffle full-outer
  * join on the key — both sides co-partition; with id-bucketed tables
  * the join is exchange-free. No window over the snapshot, no broadcast
  * assumption (change batches can be arbitrarily large in a backfill).
  */
object Cdc {

  /** Apply `changes` (idCol, opCol ∈ {I,U,D}, payload columns = the
    * snapshot's non-id columns) onto `snapshot`. Returns the new
    * snapshot with the snapshot's column order. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, idCol: String,
      opCol: String, seqCol: Option[String] = None): DataFrame = {
    val payload = snapshot.columns.filterNot(_ == idCol).toSeq
    // no seqCol = a single-version batch: the same machinery with a
    // constant sequence, so duplicate keys in the batch raise instead of
    // silently fanning out through the join
    val (withSeq, sq0) = seqCol match {
      case Some(sq) => (changes, sq)
      case None => (changes.withColumn("__seq0", lit(0L)), "__seq0")
    }
    val sq = sq0
    val guarded = withSeq
      .groupBy(col(idCol), col(sq))
      .agg(count(lit(1)).as("__n"),
        // max is deterministic but the guard below rejects >1 row per
        // (key, seq) before it can matter
        max(struct((opCol +: payload).map(col): _*)).as("__p"))
      // the guard rides the seq column the next aggregation reads, so
      // column pruning can't drop it out of the plan
      .withColumn(sq,
        when(col("__n") === 1, col(sq)).otherwise(raise_error(
          concat(lit("applyChanges: conflicting changes for key "),
            col(idCol).cast("string"), lit(" at seq "),
            col(sq).cast("string")))))
    val latest = guarded
      .groupBy(col(idCol))
      .agg(max(struct(col(sq) +: (opCol +: payload).map(c =>
        col(s"__p.$c").as(c)): _*)).as("__m"))
      .select(col(idCol) +:
        (opCol +: payload).map(c => col(s"__m.$c").as(c)): _*)
    val c = latest.select(col(idCol).as("__k"), col(opCol).as("__op"),
      struct(payload.map(col): _*).as("__new"))
    val s = snapshot.select(col(idCol).as("__k"),
      struct(payload.map(col): _*).as("__old"))
    s.join(c, Seq("__k"), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .withColumn("__row",
        when(col("__op").isNull, col("__old")).otherwise(col("__new")))
      .select(col("__k").as(idCol) +:
        payload.map(p => col(s"__row.$p").as(p)): _*)
  }

  /** SCD Type-2 dimension history (Kimball): collapse a keyed change log
    * into versioned rows carrying [valid_from, valid_to) and a current
    * flag — the warehouse primitive behind "what did this row look like
    * on date X". Consecutive deliveries of the SAME tracked value
    * compact into one version (re-sending an unchanged payload must not
    * open a new version); `valid_to` is the NEXT version's start, null
    * (open) for the key's latest version.
    *
    * Scale shape: both windows (the change-vs-previous compaction lag and
    * the valid_to lead) partition on the key and everything shuffles
    * exactly once on it — one exchange family, AQE-reusable. Per-key
    * state is the key's own change rows (bounded by per-entity change
    * counts, the same contract as [[Behavior.rollingFeatures]]), never a
    * cross-key structure. Pure integer/struct comparisons — no floats, so
    * any SQL engine replays it exactly.
    *
    * Null-safe: a tracked value of null compacts against null via `<=>`
    * (re-delivering null does not reopen a version). */
  def scd2History(changes: DataFrame, keyCol: String, seqCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "scd2History: need at least one tracked column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(seqCol))
    val v = struct(valueCols.map(col): _*)
    val compacted = changes
      .select((keyCol +: seqCol +: valueCols).distinct.map(col): _*)
      .withColumn("__prev", lag(v, 1).over(w))
      .withColumn("__first", lag(lit(1), 1).over(w).isNull)
      // keep the first delivery and every delivery whose tracked struct
      // differs from the previous one (null-safe: <=> on the struct)
      .filter(col("__first") || !(v <=> col("__prev")))
      .drop("__prev", "__first")
    compacted
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(seqCol)
  }
}

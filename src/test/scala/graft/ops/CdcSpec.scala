package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the CDC MERGE/upsert operator: latest-seq
  * wins, delete/upsert/insert semantics, replay idempotence, and the
  * conflicting-same-seq in-plan guard. */
class CdcSpec extends SparkSpec {

  private def snap() = {
    import spark.implicits._
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "v", "n")
  }

  test("applyChanges: delete, out-of-order update, upsert-insert") {
    import spark.implicits._
    val changes = Seq(
      (1L, "D", 1L, "x", 0), // delete id 1
      (2L, "U", 2L, "b2", 21), // the winner (higher seq)
      (2L, "U", 1L, "bX", 99), // late-arriving older update — must lose
      (4L, "U", 1L, "d", 40), // update without a match → upsert lands
      (5L, "I", 1L, "e", 50)) // plain insert
      .toDF("id", "op", "seq", "v", "n")
    val out = Cdc.applyChanges(snap(), changes, "id", "op", Some("seq"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((2L, "b2", 21), (3L, "c", 30), (4L, "d", 40), (5L, "e", 50)))
  }

  test("applyChanges: replaying the same batch is idempotent") {
    import spark.implicits._
    val changes = Seq((1L, "D", 1L, "x", 0), (2L, "U", 2L, "b2", 21),
      (5L, "I", 1L, "e", 50)).toDF("id", "op", "seq", "v", "n")
    val once = Cdc.applyChanges(snap(), changes, "id", "op", Some("seq"))
    val twice = Cdc.applyChanges(once, changes, "id", "op", Some("seq"))
      .orderBy("id").collect()
    assert(twice.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "b2"), (3L, "c"), (5L, "e")))
  }

  test("applyChanges: conflicting changes at one (key, seq) raise") {
    import spark.implicits._
    val changes = Seq((2L, "U", 1L, "p", 1), (2L, "U", 1L, "q", 2))
      .toDF("id", "op", "seq", "v", "n")
    val ex = intercept[Exception] {
      Cdc.applyChanges(snap(), changes, "id", "op", Some("seq")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m =>
      m != null && m.contains("conflicting changes")))
  }

  test("applyChanges without seq: duplicate keys in a batch raise") {
    import spark.implicits._
    val changes = Seq((2L, "U", "p", 1), (2L, "U", "q", 2))
      .toDF("id", "op", "v", "n")
    val ex = intercept[Exception] {
      Cdc.applyChanges(snap(), changes, "id", "op", None).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m =>
      m != null && m.contains("conflicting changes")))
  }

  test("applyChanges: partition-invariant") {
    import spark.implicits._
    val changes = Seq((1L, "D", 1L, "x", 0), (2L, "U", 2L, "b2", 21))
      .toDF("id", "op", "seq", "v", "n")
    val a = Cdc.applyChanges(snap(), changes, "id", "op", Some("seq"))
      .orderBy("id").collect().toSeq
    val b = Cdc.applyChanges(snap().repartition(7),
        changes.repartition(5), "id", "op", Some("seq"))
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of and range joins: hand-computed semantics, tie handling, the
  * bucket-span guard, plan shape (hash join, no nested loop), and
  * partition invariance. */
class TemporalJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def probes = {
    import spark.implicits._
    Seq(
      (1L, 10L, ts("2024-01-01 00:00:30"), "a"),
      (2L, 10L, ts("2024-01-01 00:02:00"), "b"),
      (3L, 10L, ts("2024-01-01 00:00:05"), "c"), // before any state
      (4L, 20L, ts("2024-01-01 00:01:00"), "d"),
      (5L, 30L, ts("2024-01-01 00:09:00"), "e")  // key with no state at all
    ).toDF("id", "k", "t", "payload")
  }

  private def states = {
    import spark.implicits._
    Seq(
      (100L, 10L, ts("2024-01-01 00:00:10"), 1.0),
      (101L, 10L, ts("2024-01-01 00:00:30"), 2.0), // equal to probe 1's time
      (102L, 10L, ts("2024-01-01 00:01:00"), 3.0),
      (103L, 20L, ts("2024-01-01 00:00:59"), 4.0)
    ).toDF("sid", "k", "st", "sv")
  }

  test("as-of join picks the greatest state time <= probe time per key") {
    val out = TemporalJoin.asofJoin(probes, states, "k", "t", "st",
        Seq("sid", "sv"), rightTieBreak = Some("sid"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(1L) == ((Some(101L), Some(2.0)))) // <= includes equal time
    assert(out(2L) == ((Some(102L), Some(3.0))))
    assert(out(3L) == ((None, None)))            // nothing at or before
    assert(out(4L) == ((Some(103L), Some(4.0))))
    assert(out(5L) == ((None, None)))            // keyless
    assert(out.size == 5)                        // every left row survives
  }

  test("as-of ties on time resolve to the greatest tiebreak, deterministically") {
    import spark.implicits._
    val dup = Seq(
      (200L, 10L, ts("2024-01-01 00:00:10"), 8.0),
      (201L, 10L, ts("2024-01-01 00:00:10"), 9.0)
    ).toDF("sid", "k", "st", "sv")
    def run(parts: Int) = TemporalJoin.asofJoin(
        probes.repartition(parts), dup.repartition(parts), "k", "t", "st",
        Seq("sid", "sv"), rightTieBreak = Some("sid"))
      .filter(col("id") === 1L).head
    val a = run(1); val b = run(7)
    assert(a.getLong(4) == 201L && a.getDouble(5) == 9.0)
    assert(b.getLong(4) == 201L && b.getDouble(5) == 9.0)
  }

  test("as-of join plan: one key shuffle + window, no nested loop") {
    val plan = TemporalJoin.asofJoin(probes, states, "k", "t", "st",
      Seq("sv")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Window"))
  }

  test("range join matches inclusive bounds via bucket bands") {
    import spark.implicits._
    val intervals = Seq(
      (500L, 10L, ts("2024-01-01 00:00:10"), ts("2024-01-01 00:00:30")),
      (501L, 10L, ts("2024-01-01 00:01:50"), ts("2024-01-01 00:02:10")),
      (502L, 20L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:05:00"))
    ).toDF("iid", "k", "s", "e")
    val got = TemporalJoin.rangeJoin(probes, intervals, "k", "t", "s", "e",
        Seq("iid"), bucketSeconds = 60)
      .select("id", "range_iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // probe 1 (00:00:30) hits 500's inclusive end; probe 2 hits 501;
    // probe 3 (00:00:05) is before 500; probe 4 inside 502; probe 5 nothing
    assert(got == Set((1L, 500L), (2L, 501L), (4L, 502L)))
    // no duplicate pairs even though 502 spans 6 buckets
    val all = TemporalJoin.rangeJoin(probes, intervals, "k", "t", "s", "e",
      Seq("iid"), bucketSeconds = 60).collect()
    assert(all.length == 3)
  }

  test("range join guard fails fast on intervals spanning too many buckets") {
    import spark.implicits._
    val wide = Seq((600L, 10L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("iid", "k", "s", "e")
    val ex = intercept[Exception] {
      TemporalJoin.rangeJoin(probes, wide, "k", "t", "s", "e",
        Seq("iid"), bucketSeconds = 60, maxBucketsPerInterval = 100).collect()
    }
    assert(ex.getMessage.contains("widen bucketSeconds"))
  }

  test("range join bucket edges: probe and interval ends exactly on boundaries") {
    import spark.implicits._
    // bucketSeconds = 60; epoch-aligned boundaries at :00 of each minute.
    // interval 800: [00:01:00, 00:03:00] — start AND end exactly on bucket
    // boundaries (spans buckets 1,2,3 — the ceil(len/width)+1 replication)
    // interval 801: [00:04:30, 00:05:00] — end on a boundary, start not
    val intervals = Seq(
      (800L, 1L, ts("2024-01-01 00:01:00"), ts("2024-01-01 00:03:00")),
      (801L, 1L, ts("2024-01-01 00:04:30"), ts("2024-01-01 00:05:00"))
    ).toDF("iid", "k", "s", "e")
    // probes at every boundary and just around them
    val edgeProbes = Seq(
      (10L, 1L, ts("2024-01-01 00:01:00")), // == start of 800 (boundary)
      (11L, 1L, ts("2024-01-01 00:00:59")), // 1s before start: no match
      (12L, 1L, ts("2024-01-01 00:02:00")), // interior boundary
      (13L, 1L, ts("2024-01-01 00:03:00")), // == end of 800 (boundary, inclusive)
      (14L, 1L, ts("2024-01-01 00:03:01")), // 1s after end: no match
      (15L, 1L, ts("2024-01-01 00:05:00")), // == end of 801 (boundary, inclusive)
      (16L, 1L, ts("2024-01-01 00:04:30")), // == start of 801 (not boundary)
      (17L, 1L, ts("2024-01-01 00:04:00"))  // boundary before 801 starts: no match
    ).toDF("id", "k", "t")
    val got = TemporalJoin.rangeJoin(edgeProbes, intervals, "k", "t", "s", "e",
        Seq("iid"), bucketSeconds = 60)
      .select("id", "range_iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 800L), (12L, 800L), (13L, 800L),
      (15L, 801L), (16L, 801L)))
    // no duplicates from the band replication
    val n = TemporalJoin.rangeJoin(edgeProbes, intervals, "k", "t", "s", "e",
      Seq("iid"), bucketSeconds = 60).count()
    assert(n == 5L)
  }

  test("range join guard fails fast on inverted intervals (end < start)") {
    import spark.implicits._
    val inverted = Seq((700L, 10L, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:00:00")))
      .toDF("iid", "k", "s", "e")
    val ex = intercept[Exception] {
      TemporalJoin.rangeJoin(probes, inverted, "k", "t", "s", "e",
        Seq("iid"), bucketSeconds = 60).collect()
    }
    assert(ex.getMessage.contains("end precedes start"))
  }

  test("range join plan is a hash join on (key, bucket), not a nested loop") {
    import spark.implicits._
    val intervals = Seq((500L, 10L, ts("2024-01-01 00:00:10"), ts("2024-01-01 00:00:30")))
      .toDF("iid", "k", "s", "e")
    val plan = TemporalJoin.rangeJoin(probes, intervals, "k", "t", "s", "e",
      Seq("iid"), bucketSeconds = 60).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Join"))
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Differential pins for the round-11 experiment/graph/time-series wave:
  * each operator re-computed by a NAIVE single-machine model (plain
  * Scala sets, folds, sorts — no Spark) on seeded random inputs, then
  * compared exactly. The gate oracles pin cross-engine parity at sf
  * scale; these pin the SEMANTICS against an implementation too simple
  * to be wrong, over inputs a hand-written fixture wouldn't reach.
  */
class ExperimentDifferentialSpec extends SparkSpec {

  test("bhFdr == naive step-up over random p-vectors (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new Random(seed)
      val ps = Seq.fill(40)(math.rint(rnd.nextDouble() * 1e9) / 1e9)
      val df = ps.zipWithIndex.map { case (p, i) => ("f", s"t$i", p) }
        .toDF("fam", "tid", "p")
      val got = Stats.bhFdr(df, "tid", "p", "fam", alpha = 0.1)
        .orderBy("test_id").collect()
        .map(r => r.getString(1) -> (r.getDouble(5), r.getBoolean(6)))
        .toMap
      // naive: sort, q_i = min_{j>=i}(p_j * m / j), clamp, round 6
      val sorted = ps.sorted
      val m = ps.length
      val raw = sorted.zipWithIndex.map { case (p, i) => p * m / (i + 1) }
      val qs = raw.indices.map(i => math.min(1.0, raw.drop(i).min))
      val qByP = sorted.zip(qs).toMap
      ps.zipWithIndex.foreach { case (p, i) =>
        val (q, disc) = got(s"t$i")
        assert(math.abs(q - qByP(p)) < 1e-6, s"q mismatch seed=$seed i=$i")
        assert(disc == (qByP(p) <= 0.1), s"discovery seed=$seed i=$i")
      }
    }
  }

  test("adamicAdar == brute-force set model on a random graph") {
    import spark.implicits._
    val rnd = new Random(9)
    val edges = (1 to 60).map(_ =>
      (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter { case (a, b) => a != b }.distinct
    val df = edges.toDF("src", "dst")
    val got = Graph.adamicAdar(df, "src", "dst", minCommon = 1L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    // naive: neighbor sets over the undirected simple graph
    val und = edges.map { case (a, b) => (a min b, a max b) }.distinct
    val nbrs = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    def r10(x: Double) = math.rint(x * 1e10) / 1e10
    val nodes = nbrs.keys.toSeq.sorted
    var pairs = 0
    for (a <- nodes; b <- nodes if a < b) {
      val cn = (nbrs(a) & nbrs(b)).toSeq
      if (cn.nonEmpty) {
        pairs += 1
        val aa = r6(cn.map(z => r10(1.0 / math.log(nbrs(z).size))).sum)
        val jac = r6(cn.size.toDouble /
          (nbrs(a).size + nbrs(b).size - cn.size))
        val isEdge = und.contains((a, b))
        val (gcn, gaa, gjac, ge) = got((a, b))
        assert(gcn == cn.size.toLong && ge == isEdge, s"pair ($a,$b)")
        assert(math.abs(gaa - aa) < 1e-6, s"aa ($a,$b)")
        assert(math.abs(gjac - jac) < 1e-6, s"jaccard ($a,$b)")
      }
    }
    assert(pairs == got.size && pairs > 5)
  }

  test("sprt == sequential fold on a random success sequence") {
    import spark.implicits._
    val rnd = new Random(5)
    val ss = Seq.fill(300)(if (rnd.nextDouble() < 0.42) 1 else 0)
    val df = ss.zipWithIndex.map { case (s, i) =>
      ("g", f"2024-01-01 ${i / 3600}%02d:${(i / 60) % 60}%02d:${i % 60}%02d",
        i.toLong, s)
    }.toDF("g", "tss", "id", "s")
      .withColumn("ts", to_timestamp(col("tss")))
    val got = Behavior.sprt(df, "g", "ts", "id", col("s") === 1,
      p0 = 0.35, p1 = 0.45).collect().head
    // naive sequential fold with the operator's own compiled constants
    val (c1, c0, a, b) = Behavior.sprtConstants(0.35, 0.45, 0.05, 0.05)
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    var k = 0L
    var decision: Option[(String, Long, Double)] = None
    var llr = 0.0
    ss.zipWithIndex.foreach { case (s, i) =>
      k += s
      llr = r9(k * c1 + ((i + 1) - k) * c0)
      if (decision.isEmpty) {
        if (llr >= a) decision = Some(("accept_h1", i + 1L, llr))
        else if (llr <= b) decision = Some(("accept_h0", i + 1L, llr))
      }
    }
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got.getLong(1) == 300L && got.getLong(2) == ss.sum.toLong)
    assert(got.getDouble(3) == r6(llr))
    decision match {
      case Some((d, n, l)) =>
        assert(got.getString(4) == d && got.getLong(5) == n)
        assert(got.getDouble(6) == r6(l))
      case None =>
        assert(got.getString(4) == "continue" && got.isNullAt(5))
    }
  }

  test("ewma and holt == BigDecimal recursions on a random series") {
    import spark.implicits._
    val rnd = new Random(3)
    val xs = Seq.fill(40)(math.rint(rnd.nextDouble() * 10000) / 100.0)
    val df = xs.zipWithIndex.map { case (x, i) =>
      (1L, 1704067200L + i * 86400L, x)
    }.toDF("user_id", "epoch", "value")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val gotE = Behavior.ewma(df, "user_id", "ts", "value", 86400L,
      alpha = 0.3).orderBy("b").collect().map(_.getDouble(3)).toSeq
    val a = BigDecimal("0.300"); val a1 = BigDecimal("0.700")
    val expE = xs.tail.scanLeft(BigDecimal(xs.head).setScale(6)) {
      (e, x) => (a * BigDecimal(x).setScale(2, BigDecimal.RoundingMode
        .HALF_UP) + a1 * e).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.map(_.toDouble)
    assert(gotE == expE)
    val gotH = Behavior.holtLinear(df, "user_id", "ts", "value", 86400L,
      alpha = 0.3, beta = 0.1).orderBy("b").collect()
      .map(r => (r.getDouble(3), r.getDouble(4))).toSeq
    val bb = BigDecimal("0.100"); val b1 = BigDecimal("0.900")
    val init = (BigDecimal(xs.head).setScale(6),
      BigDecimal(0).setScale(6))
    val expH = xs.tail.scanLeft(init) { case ((l, t), x) =>
      val xq = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val ln = (a * xq + a1 * (l + t))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val tn = (bb * (ln - l) + b1 * t)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (ln, tn)
    }.map { case (l, t) => (l.toDouble, t.toDouble) }
    assert(gotH == expH)
  }

  test("bootstrapCI and permutationTest are row-order invariant") {
    import spark.implicits._
    val rnd = new Random(11)
    val rows = (1 to 60).map(i =>
      ("a", i.toLong, math.rint(rnd.nextDouble() * 1000) / 10.0,
        if (rnd.nextBoolean()) "x" else "y"))
    val fwd = rows.toDF("g", "id", "v", "arm")
    val rev = rows.reverse.toDF("g", "id", "v", "arm").repartition(7)
    val b1 = Stats.bootstrapCI(fwd, "id", "v", "g", b = 24)
      .collect().head.toString
    val b2 = Stats.bootstrapCI(rev, "id", "v", "g", b = 24)
      .collect().head.toString
    assert(b1 == b2)
    val p1 = Stats.permutationTest(fwd, "id", "v", "arm", "x", "y", "g",
      b = 24).collect().head.toString
    val p2 = Stats.permutationTest(rev, "id", "v", "arm", "x", "y", "g",
      b = 24).collect().head.toString
    assert(p1 == p2)
  }

  test("permutationTest null calibration holds under 90/10 allocation") {
    import spark.implicits._
    // 40 independent null groups, each 36 'a' + 4 'b' rows with an
    // arm-independent value pattern. With the allocation-matched coin
    // the p-values are ~Uniform(0,1): #\{p <= 0.25\} ~ Binomial(40, .25)
    // (mean 10, sd 2.7). A fair P=1/2 relabel coin would understate the
    // null spread by sqrt((4/n)/(1/n_a+1/n_b)) = 0.6 here, inflating
    // that count to ~20 (anti-conservative). The md5 coin makes the
    // whole readout deterministic, so the bound is a hard pin, not a
    // flaky statistical assertion.
    val rows = for (g <- 1 to 40; i <- 1 to 40) yield
      (g.toLong, (g * 1000 + i).toLong, ((g * 31 + i * 7) % 13).toDouble,
        if (i <= 36) "a" else "b")
    val df = rows.toDF("g", "id", "v", "arm")
    val out = Stats.permutationTest(df, "id", "v", "arm", "a", "b", "g",
      b = 60).collect()
    assert(out.length == 40)
    out.foreach { r =>
      assert(r.getLong(1) == 36L && r.getLong(2) == 4L)
      // a replicate degenerates when all 40 coins land on one side
      // (P ~ 0.9^40 = 1.5% per replicate) — most of the 60 survive
      assert(r.getLong(4) >= 50L, s"b_used ${r.getLong(4)}")
    }
    val small = out.count(r => !r.isNullAt(6) && r.getDouble(6) <= 0.25)
    assert(small >= 3 && small <= 17,
      s"calibration: $small of 40 null groups at p <= 0.25")
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Third differential block: decision-stump screening vs an exhaustive
  * threshold search, CUPED vs a naive moment model, and funnel latency
  * vs a sequential per-user replay — same seeded-random, naive-model
  * discipline as the sibling specs.
  */
class FeatureDifferentialSpec extends SparkSpec {

  test("bestSplit == exhaustive Gini search on random features") {
    import spark.implicits._
    val rnd = new Random(17)
    val rows = (1 to 200).map { _ =>
      val y = rnd.nextBoolean()
      // f1 carries signal, f2 is noise with heavy ties
      val f1 = (if (y) 3.0 else 0.0) + rnd.nextInt(5)
      val f2 = rnd.nextInt(4).toDouble
      (f1, f2, y)
    }
    val df = rows.toDF("f1", "f2", "y")
    val got = Stats.bestSplit(df, Seq("f1", "f2"), "y")
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(5), r.getDouble(6))).toMap
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    def gini(p: Double) = 1.0 - (p * p + (1.0 - p) * (1.0 - p))
    for ((name, fx) <- Seq(
        ("f1", rows.map(r => (r._1, r._3))),
        ("f2", rows.map(r => (r._2, r._3))))) {
      val n = fx.size
      val np = fx.count(_._2)
      val cand = fx.map(_._1).distinct.sorted.dropRight(1)
      val best = cand.map { t =>
        val left = fx.filter(_._1 <= t)
        val right = fx.filter(_._1 > t)
        val g = left.size.toDouble / n * gini(
          left.count(_._2).toDouble / left.size) +
          right.size.toDouble / n * gini(
            right.count(_._2).toDouble / right.size)
        (r9(g), t)
      }.min
      val gp = r9(gini(np.toDouble / n))
      val (bt, gs, gain) = got(name)
      assert(bt == best._2, s"$name threshold")
      assert(math.abs(gs - r6(best._1)) < 1e-9, s"$name gini")
      assert(math.abs(gain - r6(gp - best._1)) < 1e-9, s"$name gain")
    }
  }

  test("cupedAdjust == naive theta/xbar model, variance actually drops") {
    import spark.implicits._
    val rnd = new Random(23)
    val rows = (1L to 150L).map { i =>
      val x = math.rint(rnd.nextDouble() * 10000) / 100.0
      val y = math.rint((2.0 * x + rnd.nextGaussian() * 50) * 100) / 100.0
      (i, x, y)
    }
    val df = rows.toDF("id", "x", "y").withColumn("g", lit("a"))
    val got = Stats.cupedAdjust(df, "id", "y", "x", "g")
      .collect().map(r => r.getLong(1) -> r.getDouble(6)).toMap
    // naive: exact-arithmetic moments over the 2-dp quantized values
    def q2(v: Double) = BigDecimal(v)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val xs = rows.map(r => q2(r._2)); val ys = rows.map(r => q2(r._3))
    val n = rows.size.toDouble
    val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
    val sxx = xs.map(v => v * v).sum.toDouble
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val xbar = sx / n
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    rows.foreach { case (i, x, y) =>
      val exp = r6(q2(y).toDouble - theta * (q2(x).toDouble - xbar))
      assert(math.abs(got(i) - exp) < 1e-9, s"row $i")
    }
    // CUPED's point: the adjusted metric's variance is lower
    def variance(vs: Seq[Double]) = {
      val m = vs.sum / vs.size
      vs.map(v => (v - m) * (v - m)).sum / vs.size
    }
    // y = 2x + N(0, 50): var(y) ~ 4*var(x) + 2500, adjusted ~ 2500 —
    // the construction leaves ~43% residual variance; assert well below
    // raw but above the impossible-noise floor
    val rawVar = variance(rows.map(_._3))
    val adjVar = variance(rows.map(r => got(r._1)))
    assert(adjVar < rawVar * 0.6 && adjVar > rawVar * 0.2,
      s"var $rawVar -> $adjVar")
  }

  test("funnelLatency == sequential per-user replay on random events") {
    import spark.implicits._
    val rnd = new Random(31)
    val types = Seq("view", "click", "purchase", "other")
    val evs = (1 to 300).map { i =>
      (rnd.nextInt(25).toLong, 1704067200L + rnd.nextInt(100000),
        i.toLong, types(rnd.nextInt(types.size)))
    }
    val df = evs.toDF("user_id", "epoch", "event_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val got = Behavior.funnelLatency(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getInt(0) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))
      .toMap
    // naive replay: per user, earliest view, then earliest later click,
    // then earliest later purchase
    val steps = Seq("view", "click", "purchase")
    val byUser = evs.groupBy(_._1)
    val lats = scala.collection.mutable.Map(2 -> Seq.empty[Long],
      3 -> Seq.empty[Long])
    byUser.values.foreach { grp =>
      val sorted = grp.sortBy(e => (e._2, e._3))
      var prevT = Option.empty[Long]
      var alive = true
      steps.zipWithIndex.foreach { case (s, k) =>
        if (alive) {
          val hit = sorted.find(e => e._4 == s &&
            prevT.forall(e._2 > _))
          hit match {
            case Some(e) =>
              if (k >= 1) lats(k + 1) :+= (e._2 - prevT.get)
              prevT = Some(e._2)
            case None => alive = false
          }
        }
      }
    }
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    for (step <- Seq(2, 3) if lats(step).nonEmpty) {
      val xs = lats(step).sorted
      val n = xs.size
      def pick(q: Double) = xs(math.max(1, math.ceil(q * n).toInt) - 1)
      val (gn, gmean, gp50, gp90) = got(step)
      assert(gn == n.toLong, s"step $step n")
      assert(gmean == r6(xs.sum.toDouble / n), s"step $step mean")
      assert(gp50 == pick(0.5) && gp90 == pick(0.9), s"step $step picks")
    }
    assert(lats(2).nonEmpty && lats(3).nonEmpty)
  }
}

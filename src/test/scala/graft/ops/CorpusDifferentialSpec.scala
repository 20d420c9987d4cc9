package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Differential pins for the round-11 corpus/integrity/path wave — the
  * [[ExperimentDifferentialSpec]] discipline over the remaining
  * operators: naive single-machine models (token maps, codepoint loops,
  * set algebra, sliding windows) on seeded random inputs, compared
  * exactly against the distributed plans.
  */
class CorpusDifferentialSpec extends SparkSpec {

  private def randWords(rnd: Random, n: Int): String =
    Seq.fill(n)("w" + rnd.nextInt(12)).mkString(" ")

  test("zipfFit == naive rank/moment model on a random corpus") {
    import spark.implicits._
    val rnd = new Random(21)
    val docs = (1 to 30).map(i => ("c" + i % 2, randWords(rnd, 60)))
      .toDF("cls", "text")
    val got = Retrieval.zipfFit(docs, "cls",
        TextAnalysis.tokens(col("text")), maxRank = 8)
      .orderBy("cls").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5)))
      .toMap
    def q6(x: Double) = math.rint(x * 1e6) / 1e6
    // naive: recompute token counts from the same frame
    val counts = docs.select(col("cls"),
        explode(TextAnalysis.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case ((c, t), xs) => (c, t, xs.size) }
    for (cls <- Seq("c0", "c1")) {
      val tf = counts.filter(_._1 == cls).map(x => (x._2, x._3)).toSeq
      val head = tf.sortBy { case (t, f) => (-f, t) }.take(8)
      val pts = head.zipWithIndex.map { case ((_, f), i) =>
        (q6(math.log(i + 1.0)), q6(math.log(f.toDouble)))
      }
      val n = pts.size.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val num = n * sxy - sx * sy
      val denX = n * sxx - sx * sx
      val denY = n * syy - sy * sy
      val (nTerms, nFit, slope, r2v) = got(cls)
      assert(nTerms == tf.size.toLong && nFit == head.size.toLong)
      assert(math.abs(slope - num / denX) < 1e-5, s"slope $cls")
      assert(math.abs(r2v - num * num / (denX * denY)) < 1e-5, s"r2 $cls")
    }
  }

  test("termBurstiness == naive per-doc count model") {
    import spark.implicits._
    val rnd = new Random(8)
    val docs = (1L to 25L).map(i => (i, randWords(rnd, 30)))
    val df = docs.toDF("doc_id", "text")
    val got = Retrieval.termBurstiness(df, "doc_id",
        TextAnalysis.tokens(col("text")), minDf = 3L)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val perDoc = docs.flatMap { case (id, text) =>
      text.split(" ").groupBy(identity).map { case (t, xs) =>
        (t, id, xs.length.toLong)
      }
    }
    val n = docs.size.toDouble
    val byTerm = perDoc.groupBy(_._1)
    byTerm.foreach { case (term, xs) =>
      val dfreq = xs.size.toLong
      if (dfreq >= 3L) {
        val cf = xs.map(_._3).sum
        val s2 = xs.map(c => c._3 * c._3).sum
        val exp = (dfreq, cf, r6(cf.toDouble / dfreq),
          r6(s2.toDouble / cf - cf / n))
        assert(got(term) == exp, s"term $term")
      } else assert(!got.contains(term), s"minDf leak $term")
    }
  }

  test("scriptMix == naive codepoint-range loop") {
    import spark.implicits._
    val rnd = new Random(4)
    val pool = "abcXYZ АБВгд αβγ 你好漢 מםא ٱلع देवना 123!? \t"
    val texts = (1L to 20L).map(i =>
      (i, Seq.fill(30)(pool(rnd.nextInt(pool.length))).mkString))
    val df = texts.toDF("doc_id", "text")
    val got = TextAnalysis.scriptMix(df, "doc_id", "text")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getInt).toSeq).toMap
    def in(c: Char, lo: Int, hi: Int): Boolean = c >= lo && c <= hi
    val ranges: Seq[(Char => Boolean)] = Seq(
      c => in(c, 'A', 'Z') || in(c, 'a', 'z') || in(c, 0xC0, 0x24F),
      c => in(c, 0x400, 0x4FF),
      c => in(c, 0x370, 0x3FF),
      c => in(c, 0x600, 0x6FF),
      c => in(c, 0x590, 0x5FF),
      c => in(c, 0x900, 0x97F),
      c => in(c, 0x4E00, 0x9FFF) || in(c, 0x3040, 0x30FF) ||
        in(c, 0xAC00, 0xD7AF))
    texts.foreach { case (id, text) =>
      val exp = text.length +: ranges.map(p => text.count(p))
      assert(got(id) == exp, s"doc $id")
    }
  }

  test("integrityAudit == naive set algebra on random keys") {
    import spark.implicits._
    val rnd = new Random(13)
    val child = Seq.fill(80)(rnd.nextInt(30).toLong)
    val parent = Seq.fill(40)(rnd.nextInt(25).toLong)
    val r = Stats.integrityAudit(child.toDF("fk"), "fk",
      parent.toDF("pk"), "pk").collect().head
    val pset = parent.toSet
    val orphanKeys = child.toSet -- pset
    val orphanRows = child.count(k => !pset.contains(k))
    assert(r.getLong(0) == 80L && r.getLong(1) == 0L)
    assert(r.getLong(2) == orphanRows.toLong)
    assert(r.getLong(3) == orphanKeys.size.toLong)
    val exEx = orphanKeys.map(_.toString).toSeq.sorted.take(5)
      .mkString(",")
    if (orphanKeys.isEmpty) assert(r.isNullAt(5))
    else assert(r.getString(5) == exEx)
    val mult = parent.groupBy(identity).map(_._2.size)
    assert(r.getLong(6) == 40L)
    assert(r.getLong(7) == pset.size.toLong)
    assert(r.getLong(8) == mult.count(_ > 1).toLong)
    assert(r.getLong(9) == mult.max.toLong)
  }

  test("pathTrigrams == naive sliding windows per (user, day)") {
    import spark.implicits._
    val rnd = new Random(2)
    val evs = (1 to 200).map { i =>
      val u = rnd.nextInt(8).toLong
      val day = rnd.nextInt(3)
      val sec = rnd.nextInt(86400)
      (u, 1704067200L + day * 86400L + sec, i.toLong,
        "e" + rnd.nextInt(4))
    }
    val df = evs.toDF("user_id", "epoch", "event_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val got = Behavior.pathTrigrams(df, "user_id", "ts", "event_type",
        "event_id", k = 1000)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val naive = evs
      .groupBy { case (u, ep, _, _) => (u, ep / 86400) }
      .values.flatMap { grp =>
        grp.sortBy { case (_, ep, id, _) => (ep, id) }
          .map(_._4).sliding(3).filter(_.size == 3)
          .map(_.mkString(">"))
      }
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    assert(got == naive && naive.nonEmpty)
  }

  test("hllOverlap: union estimate matches hllDistinct on the merge") {
    import spark.implicits._
    val rnd = new Random(6)
    val docs = (1 to 40).map(i =>
      ("s" + i % 3, randWords(rnd, 25))).toDF("src", "text")
    val ov = Sketch.hllOverlap(docs, "src", "text")
      .filter(col("g_a") === "s0" && col("g_b") === "s1")
      .collect().head
    // merging s0 and s1 into one pseudo-group and sketching directly
    // must give the SAME union estimate (register max associativity)
    val merged = docs.withColumn("src",
      when(col("src").isin("s0", "s1"), lit("m")).otherwise(col("src")))
    val direct = Sketch.hllDistinct(merged, "src", "text")
      .filter(col("grp") === "m").collect().head
    assert(ov.getDouble(4) == direct.getDouble(2), "union est == direct")
  }
}

package graft.ops

import graft.SparkSpec
import graft.functions.{PackedLongs, TextHashExprs}
import org.apache.spark.sql.functions._

/** The codegen'd text-hash kernels must be bit-identical to the
  * declarative compositions they replace (same xxhash64 seed chaining),
  * and the packed-set merges must agree with the array builtins. */
class TextHashExprsSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox"),
      (3L, "one"),
      (4L, ""),
      (5L, "  spaced   out   tokens  "),
      (6L, "dup dup dup dup"),
      (7L, "Ünïcodé tökens reMAIN case-sensitive after LOWER")
    ).toDF("id", "text")
  }

  test("ngramHashes matches xxhash64 over array_join'd shingles") {
    val toks = TextAnalysis.tokens(col("text"))
    for (n <- Seq(1, 2, 3)) {
      val old = transform(Dedup.shingles(col("text"), n), s => xxhash64(s))
      val nw = TextHashExprs.ngramHashes(spark, toks, n)
      val bad = docs.select(old.as("o"), nw.as("n"))
        .filter(not(col("o") <=> col("n"))).count()
      assert(bad == 0, s"n=$n")
    }
  }

  test("minhashSig matches per-seed array_min composition") {
    val grams = transform(Dedup.shingles(col("text"), 2), s => xxhash64(s))
    val old = Dedup.minhashFromHashes(grams, 16)
    val nw = TextHashExprs.minhashSig(spark,
      TextHashExprs.ngramHashes(spark, TextAnalysis.tokens(col("text")), 2), 16)
    val bad = docs.select(old.as("o"), nw.as("n"))
      .filter(not(col("o") <=> col("n"))).count()
    assert(bad == 0)
  }

  test("simhash kernel matches the per-bit aggregate fold") {
    val toks = TextAnalysis.tokens(col("text"))
    val old = Dedup.simhashFromHashes(transform(toks, x => xxhash64(x)))
    val nw = when(size(toks) > 0,
      TextHashExprs.simhashCol(spark, TextHashExprs.ngramHashes(spark, toks, 1)))
      .otherwise(lit(0L))
    val bad = docs.select(old.as("o"), nw.as("n"))
      .filter(not(col("o") <=> col("n"))).count()
    assert(bad == 0)
  }

  test("packed sorted-set intersect matches array_intersect size") {
    import spark.implicits._
    val pairs = Seq(
      (Seq(3L, 1L, 2L, 3L), Seq(2L, 4L, 2L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(5L, 5L), Seq(5L)),
      (Seq(Long.MinValue, -1L, Long.MaxValue), Seq(Long.MaxValue, Long.MinValue))
    ).toDF("a", "b")
    val got = pairs.select(
      PackedLongs.intersectSize(spark,
        PackedLongs.packSortedSet(spark, col("a")),
        PackedLongs.packSortedSet(spark, col("b"))).as("n"),
      size(array_intersect(col("a"), col("b"))).as("expected")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("packed eqCount counts positional agreement") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 7L))).toDF("a", "b")
    val n = df.select(PackedLongs.eqCount(spark,
      PackedLongs.pack(spark, col("a")), PackedLongs.pack(spark, col("b")))).collect()(0).getInt(0)
    assert(n == 2)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge training: hand-computed merge sequence, tie-break order,
  * greedy non-overlapping re-segmentation, early exhaustion, cap
  * semantics, and composition with the subword tokenizer. */
class BpeSpec extends SparkSpec {

  private def docs(rows: String*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def merges(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  test("learns the hand-computed merge sequence with exact pair counts") {
    // corpus: "low" x4, "lower" x2, "newest" x3
    val c = docs(
      "low low low low lower lower newest",
      "newest newest")
    val m = merges(TextAnalysis.bpeTrain(c, "text", numMerges = 3))
    // round 1 pairs: (l,o)=6, (o,w)=6, (w,e)=2, (e,r)=2, (n,e)=3, (e,w)=3,
    // (w,e)... recount: low: l-o,o-w (x4); lower: l-o,o-w,w-e,e-r (x2);
    // newest: n-e,e-w,w-e,e-s,s-t (x3)
    // (l,o)=6 (o,w)=6 (w,e)=2+3=5 (e,r)=2 (n,e)=3 (e,w)=3 (e,s)=3 (s,t)=3
    // max 6 tie (l o) vs (o w): "l o" < "o w" -> merge (l,o)
    assert(m(0) == ((1, "l", "o", "lo", 6L)))
    // round 2: lo-w (x6) is now the 6-count pair; others unchanged <= 5
    assert(m(1) == ((2, "lo", "w", "low", 6L)))
    // round 3: (w,e)=5 leads: lower="low e r" has low-e not w-e... recount:
    // lower -> [low,e,r]: (low,e)=2 (e,r)=2; newest -> [n,e,w,e,s,t]:
    // (n,e)=3 (e,w)=3 (w,e)=3 (e,s)=3 (s,t)=3. max=3, smallest pair "e s"
    assert(m(2) == ((3, "e", "s", "es", 3L)))
  }

  test("greedy left-to-right: a fresh merge never re-pairs in-round") {
    // "aaaa": pairs (a,a)=3; merging gives [aa,aa], not [aaa,a] or [aaaa]
    val c = docs("aaaa aaaa aaaa")
    val m = merges(TextAnalysis.bpeTrain(c, "text", numMerges = 2))
    assert(m(0)._2 == "a" && m(0)._3 == "a" && m(0)._5 == 9L)
    // round 2: [aa,aa] -> pair (aa,aa)=3
    assert(m(1) == ((2, "aa", "aa", "aaaa", 3L)))
  }

  test("stops early when no adjacent pair remains") {
    val c = docs("a b c a b")
    val m = merges(TextAnalysis.bpeTrain(c, "text", numMerges = 10))
    assert(m.isEmpty) // all words are single code points
  }

  test("maxWords cap drops tail words from the statistics") {
    // 'zz' is hapax; cap=1 keeps only 'ab' (count 3)
    val c = docs("ab ab ab zz")
    val m = merges(TextAnalysis.bpeTrain(c, "text", numMerges = 1, maxWords = 1))
    assert(m.head == ((1, "a", "b", "ab", 3L)))
  }

  test("learned vocabulary composes with subwordTokenize") {
    val c = docs("hello hello world", "hello world world")
    val learned = TextAnalysis.bpeTrain(c, "text", numMerges = 6)
      .select("merged").collect().map(_.getString(0)).toSeq
    val vocab = (learned ++ ('a' to 'z').map(_.toString)).distinct
    val seg = TextAnalysis.subwordTokenize(c, "doc_id", "text", vocab)
      .orderBy("id").collect()
    assert(seg.forall(r => r.getAs[Number](1).longValue > 0)) // every doc segments
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TopKStructAgg: the O(k)-state bounded top-k aggregate must be
  * bit-identical to slice(array_sort(collect_list(struct(negScore, id))),
  * 1, k) under any partitioning (partial merges across tasks exercise
  * serialize/deserialize/merge). */
class TopKAggSpec extends SparkSpec {

  private def scored = {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random scores with deliberate ties across groups
    (0 until 2000).map { i =>
      val g = i % 7
      val score = ((i * 2654435761L) % 1000L) / 100.0
      (g, i.toLong, score)
    }.toDF("grp", "id", "score")
  }

  private def declarative(k: Int) = {
    val item = struct((lit(-1.0) * col("score")).as("negScore"),
      col("id").as("id"))
    scored.groupBy(col("grp"))
      .agg(slice(array_sort(collect_list(item)), 1, k).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), (col("pos") + 1).as("rank"), col("col.id"),
        (lit(-1.0) * col("col.negScore")).as("score"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
  }

  private def bounded(k: Int, partitions: Int) = {
    val df = if (partitions > 0) scored.repartition(partitions) else scored
    Similarity.topKPerGroup(df, "grp", "id", "score", k)
      .collect().map(r => (r.getInt(0), r.getLong(1).toInt, r.getLong(2),
        r.getDouble(3))).toSet
  }

  test("bounded aggregate equals the declarative sort+slice for every k") {
    for (k <- Seq(1, 5, 37, 5000)) // 5000 > group size: returns everything
      assert(bounded(k, 0) == declarative(k), s"k=$k")
  }

  test("partition-invariant: partial merges across 1/3/13 partitions agree") {
    val want = bounded(10, 1)
    assert(bounded(10, 3) == want)
    assert(bounded(10, 13) == want)
    assert(want.nonEmpty)
  }

  test("score ties rank by ascending id") {
    val s = spark
    import s.implicits._
    val df = Seq((0, 5L, 1.0), (0, 2L, 1.0), (0, 9L, 1.0), (0, 1L, 0.5))
      .toDF("grp", "id", "score")
    val got = Similarity.topKPerGroup(df, "grp", "id", "score", 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toList == List((1L, 2L), (2L, 5L)))
  }

  test("string ids keep their type and values through the generic path") {
    val s = spark
    import s.implicits._
    val df = Seq((0, "doc-b", 1.0), (0, "doc-a", 1.0), (0, "doc-z", 2.0),
        (0, "doc-c", 0.5), (1, "only", 3.0))
      .toDF("grp", "id", "score")
    val out = Similarity.topKPerGroup(df, "grp", "id", "score", 2)
    assert(out.schema("id").dataType ==
      org.apache.spark.sql.types.StringType)
    val got = out.orderBy("grp", "rank")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    // score desc, then id asc on the tie — doc-a before doc-b
    assert(got.toList == List((0, 1L, "doc-z", 2.0), (0, 2L, "doc-a", 1.0),
      (1, 1L, "only", 3.0)))
  }

  test("string-id corpora flow end to end through bruteForceTopK and bm25") {
    val s = spark
    import s.implicits._
    val e = Seq(("a", Array(1.0f, 0.0f)), ("b", Array(0.9f, 0.1f)),
        ("c", Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val nn = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        e.filter(col("vec_id") === "a"), "vec_id", "embedding", k = 1)
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(nn.toList == List(("a", "b"))) // silently-empty would be Nil
    val docs = Seq(("d1", "spark cluster"), ("d2", "cats"))
      .toDF("doc_id", "text")
    val hits = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq(("q1", "spark")).toDF("doc_id", "text"), "doc_id", "text", k = 5)
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(hits.toList == List(("q1", "d1")))
  }
}

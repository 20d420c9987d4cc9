package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: LUT-kernel parity with declarative dots, ADC
  * scores equal to the reconstructed-centroid dot, partition invariance,
  * and plan-size independence from codebook size. */
class PqIndexSpec extends SparkSpec {

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("LUT kernel matches declarative subspace dots") {
    val e = embeddings.limit(50)
    val (_, books) = PqIndex.build(e, "vec_id", "embedding", m = 4, ksub = 4)
    val v = Similarity.toDouble(col("embedding"))
    val offsets = books.books.map(_.size).scanLeft(0)(_ + _).dropRight(1)
    val declared = books.books.zipWithIndex.flatMap { case (book, s) =>
      book.map { cent =>
        Similarity.dot(slice(v, s * books.dsub + 1, books.dsub),
          array(cent.map(lit): _*))
      }
    }
    val rows = e.select(
        graft.functions.PqExprs.pqLut(spark, v, books.books, books.dsub).as("lut"),
        array(declared: _*).as("want"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1))
    }
    assert(offsets.last == books.books.dropRight(1).map(_.size).sum)
  }

  test("ADC score equals the dot with the reconstructed (decoded) vector") {
    val e = embeddings.filter(col("vec_id") < 200)
    val (codes, books) = PqIndex.build(e, "vec_id", "embedding", m = 2, ksub = 8)
    val queries = e.filter(col("vec_id") < 5)
    val got = PqIndex.searchAdc(codes, books, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    // reconstruct each corpus vector from its codes and score by plain dot
    val codeMap = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val qVecs = queries
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    got.foreach { case ((qId, rank, nId), score) =>
      val decoded = codeMap(nId).zipWithIndex
        .flatMap { case (c, s) => books.books(s)(c) }.toArray
      val q = qVecs(qId)
      // subspace-ordered sum, exactly as searchAdc adds its m terms
      val want = (0 until books.m).map { s =>
        var acc = 0.0
        var j = 0
        while (j < books.dsub) {
          acc += q(s * books.dsub + j) * decoded(s * books.dsub + j); j += 1
        }
        acc
      }.reduce(_ + _)
      assert(score == want, s"q=$qId rank=$rank n=$nId")
    }
    assert(got.nonEmpty)
  }

  test("codes and codebooks are partition-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) = {
      val (codes, books) = PqIndex.build(df, "vec_id", "embedding", m = 2, ksub = 8)
      (codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap, books)
    }
    val (ca, ba) = run(embeddings.repartition(1))
    val (cb, bb) = run(embeddings.repartition(7))
    assert(ba == bb)
    assert(ca == cb)
    assert(ca.nonEmpty)
  }

  test("plan size is independent of codebook size (task-broadcast LUT kernel)") {
    def exprNodes(ksub: Int): Int = {
      val dsub = 8
      val books = (0 until 8).map(s =>
        (0 until ksub).map(c => (0 until dsub).map(j => (s + c + j) * 0.01)))
      val df = embeddings.select(graft.functions.PqExprs.pqLut(spark,
        Similarity.toDouble(col("embedding")), books, dsub).as("lut"))
      df.queryExecution.analyzed.expressions
        .map(_.collect { case e => e }.size).sum
    }
    assert(exprNodes(4) == exprNodes(256))
    assert(exprNodes(256) < 30)
  }
}

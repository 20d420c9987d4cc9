package graft.ops

import graft.SparkSpec
import graft.functions.BloomExprs
import org.apache.spark.sql.functions._

/** Bloom-filter kernels and the Bloom-prefiltered decontamination route:
  * the no-false-negative guarantee (property over random members), a
  * false-positive-rate sanity bound, parameter math, and end-to-end
  * equality with the broadcast [[TextAnalysis.decontaminate]] path. */
class BloomSpec extends SparkSpec {

  private def documents = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("optimal parameter math: word-aligned bits, sane hash count") {
    val bits = BloomExprs.optimalNumBits(1000, 0.01)
    assert(bits % 64 == 0)
    // standard formula: ~9.585 bits/key at 1% fpp
    assert(bits >= 9000 && bits <= 10000, s"bits=$bits")
    val k = BloomExprs.optimalNumHashes(1000, bits)
    assert(k >= 6 && k <= 8, s"k=$k") // ~ln2 * m/n ≈ 6.6
  }

  test("no false negatives: every inserted member passes all probes") {
    val rnd = new scala.util.Random(7)
    val members = Seq.fill(5000)(rnd.nextLong())
    val df = spark.createDataFrame(
      members.map(Tuple1(_))).toDF("fp")
    val numBits = BloomExprs.optimalNumBits(members.size, 0.01)
    val numHashes = BloomExprs.optimalNumHashes(members.size, numBits)
    val words = TextAnalysis.buildBloomFilter(df, "fp", numBits, numHashes)
    val hits = df.select(BloomExprs.countContained(
        spark, array(col("fp")), words, numHashes).as("h"))
      .agg(sum("h")).head.getLong(0)
    assert(hits == members.size.toLong, s"only $hits/${members.size} members hit")
  }

  test("false-positive rate lands near the design fpp") {
    val rnd = new scala.util.Random(11)
    val members = Seq.fill(5000)(rnd.nextLong()).distinct
    val memberSet = members.toSet
    val nonMembers = Iterator.continually(rnd.nextLong())
      .filterNot(memberSet).take(20000).toSeq
    val df = spark.createDataFrame(members.map(Tuple1(_))).toDF("fp")
    val numBits = BloomExprs.optimalNumBits(members.size, 0.01)
    val numHashes = BloomExprs.optimalNumHashes(members.size, numBits)
    val words = TextAnalysis.buildBloomFilter(df, "fp", numBits, numHashes)
    val fp = nonMembers.count { x =>
      (0 until numHashes).forall { i =>
        val pos = BloomExprs.position(x, i, numBits)
        (words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) != 0L
      }
    }
    val rate = fp.toDouble / nonMembers.size
    assert(rate < 0.05, s"fpp=$rate for design 0.01") // 5x slack on 20k trials
    assert(rate > 0.0005, s"fpp=$rate suspiciously low — probes broken?")
  }

  test("distributed build equals a driver-side sequential build") {
    val rnd = new scala.util.Random(3)
    val members = Seq.fill(2000)(rnd.nextLong())
    val numBits = 4096L * 64
    val numHashes = 5
    val df = spark.createDataFrame(members.map(Tuple1(_))).toDF("fp")
      .repartition(8)
    val distributed = TextAnalysis.buildBloomFilter(df, "fp", numBits, numHashes)
    val sequential = new Array[Long](4096)
    members.foreach { m =>
      (0 until numHashes).foreach { i =>
        val pos = BloomExprs.position(m, i, numBits)
        sequential((pos >>> 6).toInt) |= 1L << (pos & 63L).toInt
      }
    }
    assert(java.util.Arrays.equals(distributed, sequential))
  }

  test("decontaminateBloom is bit-identical to broadcast decontaminate") {
    val docs = documents
    val evalSet = docs.filter(col("doc_id") % 19 === 0)
    val plain = TextAnalysis.decontaminate(docs, "doc_id", "text",
        evalSet, "doc_id", "text", k = 16, w = 16, minShared = 2)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val bloom = TextAnalysis.decontaminateBloom(docs, "doc_id", "text",
        evalSet, "doc_id", "text", k = 16, w = 16, minShared = 2, fpp = 0.01)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(plain == bloom)
    // the eval docs remove themselves (full self-overlap), so the filter
    // actually dropped something
    assert(bloom.size < docs.count())
  }

  test("prefilter actually prunes: clean docs never reach the verify join") {
    // an eval set textually unrelated to the corpus: random hex strings
    val rnd = new scala.util.Random(5)
    val evalRows = (0 until 50).map(i =>
      (i.toLong, Seq.fill(40)(Integer.toHexString(rnd.nextInt())).mkString(" ")))
    val evalSet = spark.createDataFrame(evalRows).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminateBloom(documents, "doc_id", "text",
      evalSet, "doc_id", "text", k = 16, w = 16, minShared = 2, fpp = 0.01)
    assert(out.count() == documents.count())
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-headroom evidence: replicate sf0.1 N× (shifted ids) and time the
  * most expensive gate queries at the larger scale, to confirm the plans
  * stay near-linear at 10× data.
  *
  * Replication is designed so output sizes grow LINEARLY with the data —
  * otherwise the measurement conflates plan scaling with data-property
  * changes:
  *  - document text goes through a per-copy Caesar cipher, so shingle and
  *    fingerprint sets are disjoint across copies (straight copies would
  *    make every doc a 10-way near-duplicate and the candidate-pair count
  *    quadratic by construction);
  *  - embeddings get a per-copy deterministic SIGN-FLIP isometry (copy 0 is
  *    identity): flipping a pseudo-random half of the dimensions preserves
  *    every within-copy cosine exactly (the same orthogonal transform is
  *    applied to both sides of any pair) while cross-copy cosines collapse
  *    toward 0; labels shift per copy so bucketed operators see each copy
  *    as a disjoint shard — near-dup candidates and output grow linearly;
  *  - orders replicate with shifted keys (row-linear operators only).
  *
  * Usage: runMain graft.ScaleBench <srcSfDir> <workDir> <copies>
  * Prints one JSON line {"metric":"scale_total", ...} like Bench.
  */
object ScaleBench {

  private val Queries = Seq(
    "s_ivf_kmeans_topk", "d_minhash_lsh", "d_lsh_jaccard_verify", "d_simhash",
    "s_cosine_topk", "adtl_onetomany", "d_embed_neardup", "q_clean_corpus",
    "d_ngram_jaccard", "d_ngram_jaccard_bounded", "m_media_feature",
    "adtl_apply_dates", "r3_one_to_many", "q_stream_window")

  private def caesar(k: Int): (String, String) = {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def rot(s: String) = s.drop(k % 26) + s.take(k % 26)
    (lower + upper, rot(lower) + rot(upper))
  }

  def replicate(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.agg(max("doc_id")).head.getLong(0) + 1
    (0 until copies).map { k =>
      val (from, to) = caesar(k)
      docs.select(
        (col("doc_id") + lit(k * nDocs)).as("doc_id"),
        translate(col("text"), from, to).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nVecs = emb.agg(max("vec_id")).head.getLong(0) + 1
    val nLabels = emb.agg(max("label")).head.getInt(0) + 1
    (0 until copies).map { k =>
      val sign =
        if (k == 0) (x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) => x
        else (x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
          (x * (lit(1) - lit(2) * pmod(xxhash64(i, lit(k)), lit(2)).cast("int"))
            .cast("float")).cast("float")
      emb.select(
        (col("vec_id") + lit(k * nVecs)).as("vec_id"),
        transform(col("embedding"), (x, i) => sign(x, i)).as("embedding"),
        (col("label") + lit(k * nLabels)).cast("int").as("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val orders = spark.read.parquet(s"$src/orders.parquet")
    val nOrders = orders.agg(max("o_orderkey")).head.getLong(0) + 1
    (0 until copies).map { k =>
      orders.withColumn("o_orderkey", col("o_orderkey") + lit(k * nOrders))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // lineitem shifts l_orderkey by the same stride as orders so each copy
    // joins exactly its own orders copy — join output grows linearly
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until copies).map { k =>
      lineitem.withColumn("l_orderkey", col("l_orderkey") + lit(k * nOrders))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // events: read RAW (ts stays a nanos long — a converted timestamp
    // column would break Tables.events' div-1000 truncation on re-read),
    // shift event and user ids; timestamps repeat per copy, so windowed
    // aggregations keep the same groups with 10× the rows per group
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$src/events.parquet")
    val nEvents = events.agg(max("event_id")).head.getLong(0) + 1
    val nUsers = events.agg(max("user_id")).head.getLong(0) + 1
    (0 until copies).map { k =>
      events
        .withColumn("event_id", col("event_id") + lit(k * nEvents))
        .withColumn("user_id", col("user_id") + lit(k * nUsers))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$work/orders.parquet").exists())
      replicate(spark, src, work, copies)

    // warmup (untimed): JIT + codegen for the shared kernels
    locally {
      def warm(body: => Unit): Unit =
        try body catch { case e: Throwable =>
          System.err.println(s"[scalebench] warmup failed: $e") }
      warm(spark.read.parquet(s"$work/documents.parquet").count())
      warm(spark.read.parquet(s"$work/embeddings.parquet").count())
      warm(spark.read.parquet(s"$work/orders.parquet").count())
      warm {
        val d = spark.read.parquet(s"$work/documents.parquet").limit(64)
        d.select(graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"))
          .groupBy("fp").count().count()
      }
      warm {
        val e = spark.read.parquet(s"$work/embeddings.parquet").limit(64)
        val v = graft.ops.Similarity.toDouble(col("embedding"))
        e.select((graft.ops.Similarity.norm(v) +
          aggregate(v, lit(0.0), (a, x) => a + x)).as("s")).agg(sum("s")).count()
      }
    }

    val results = Queries.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val rows = try fn(spark, work).count() catch {
        case e: Throwable =>
          System.err.println(s"[scalebench] $name failed: ${e.getMessage}")
          -1L
      }
      (name, (System.nanoTime() - t0) / 1e9, rows)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rs = results.map { case (k, _, r) => "\"" + k + "\":" + r }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"scale_total","value":$total,"unit":"sec","copies":$copies,"queries":$qs,"rows":$rs,"src":"$src"}""")
    spark.stop()
  }
}

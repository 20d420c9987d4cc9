package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video ride along as opaque
  * binary columns with a typed metadata struct, and decode/feature-extract
  * runs as a partition-batched function over the binary payloads (the
  * Scala analogue of mapInPandas batches).
  *
  * The actual codec is STUBBED — this container has no image/audio
  * libraries — behind `decodeStub`, a clearly-marked deterministic fake
  * that derives plausible metadata from the payload bytes. The Spark-side
  * plumbing (schema, batching, partition preservation, column wiring) is
  * real and tested; swapping `decodeStub` for a JNI/javacv decoder changes
  * no plan shape.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, nChannels: Int, format: String)
  final case class DecodedDoc(doc_id: Long, meta: MediaMeta, feature: Array[Float])

  /** Attach a synthetic binary "image" payload to each document — stands in
    * for a real binary column read from parquet. Deterministic from doc_id. */
  def withFakePayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("payload", to_binary(sha2(concat(col(idCol).cast("string"),
      lit(":"), col(textCol)), 256), lit("hex")))

  /** STUB decode ??? — replace with a real codec (e.g. javacv) in
    * production. Deterministic fake: metadata derived from payload bytes. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    // ??? real decoder goes here; fake derives dimensions from the payload
    val b0 = payload(0) & 0xff
    val b1 = payload(1) & 0xff
    MediaMeta(width = 320 + (b0 % 5) * 160, height = 240 + (b1 % 5) * 120,
      nChannels = 3, format = "fake/rgb8")
  }

  /** STUB feature extractor: an 8-dim float vector folded from the payload
    * (batch shape + schema are what production would use). */
  def featureStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) = out(i % 8) + (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Partition-batched decode: one decoder instance per partition (the
    * expensive-init pattern for real codecs), iterator-in/iterator-out so
    * batches stream without materializing a partition. */
  def decodeImages(spark: SparkSession, df: DataFrame, idCol: String): Dataset[DecodedDoc] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would happen here
        it.map { case (id, payload) =>
          DecodedDoc(id, decodeStub(payload), featureStub(payload)) }
      }
  }

  /** Expression-only metadata variant (same fake-decode math as
    * decodeStub, but staying inside codegen — used for oracle checks and as
    * the fast path when metadata alone is needed). */
  def decodeMetaExpr(df: DataFrame, idCol: String): DataFrame = {
    val hex = sha2(concat(col(idCol).cast("string"), lit(":"), col("text")), 256)
    val b0 = conv(substring(hex, 1, 2), 16, 10).cast("int")
    val b1 = conv(substring(hex, 3, 2), 16, 10).cast("int")
    df.select(col(idCol),
      (lit(320) + (b0 % 5) * 160).as("width"),
      (lit(240) + (b1 % 5) * 120).as("height"),
      lit(3).as("n_channels"),
      lit("fake/rgb8").as("format"))
  }

  /** Deterministic frame-sampling plan for video-like media: every k-th
    * frame index up to a duration derived from metadata — shape of the real
    * op, no codec required. */
  def sampleFrameIndexes(df: DataFrame, fpsCol: String, durationCol: String,
      everyNth: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0),
        greatest((col(fpsCol) * col(durationCol)).cast("int") - 1, lit(0)),
        lit(everyNth))))
}

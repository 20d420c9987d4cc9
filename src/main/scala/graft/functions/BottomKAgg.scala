package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded bottom-k buffer over (hash, id, value) triples, sorted by
  * (hash asc, id asc) — the O(k)-state core of the mergeable bottom-k
  * sample sketch ([[graft.ops.Sketch.bottomKSketch]]): the k rows with
  * the smallest deterministic hash are a uniform sample of the group,
  * and bottom-k of a union equals bottom-k over the shards' bottom-k's,
  * so partial buffers merge losslessly. The VALUE rides in the buffer —
  * that is what makes the persisted sketch self-contained (quantiles
  * answerable later without the raw data, the [[TopKBuf]] shape can't
  * carry it). */
final class BottomKBuf(val k: Int) {
  val hs = new Array[Long](k)
  val ids = new Array[Long](k)
  val vs = new Array[Double](k)
  var filled = 0

  private def before(h: Long, i: Long, h2: Long, i2: Long): Boolean =
    h < h2 || (h == h2 && i < i2)

  def insert(h: Long, id: Long, v: Double): Unit =
    if (filled < k || before(h, id, hs(k - 1), ids(k - 1))) {
      var pos = if (filled < k) filled else k - 1
      while (pos > 0 && before(h, id, hs(pos - 1), ids(pos - 1))) {
        hs(pos) = hs(pos - 1); ids(pos) = ids(pos - 1); vs(pos) = vs(pos - 1)
        pos -= 1
      }
      hs(pos) = h; ids(pos) = id; vs(pos) = v
      if (filled < k) filled += 1
    }
}

/** O(k)-state bottom-k aggregate over `struct<h: long, id: long,
  * v: double>` rows, returning the k (h, id)-lexicographically smallest
  * structs in sorted order — `slice(array_sort(collect_list(item)), 1, k)`
  * with bounded state and map-side partial merge. Deterministic: the
  * result is a function of the input SET. Duplicate (h, id) pairs are
  * deduplicated only at the window boundary — callers hash a UNIQUE id. */
case class BottomKStructAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuf] with UnaryLike[Expression] {

  require(k > 0, "k must be positive")
  child.dataType match {
    case StructType(Array(f0, f1, f2))
        if f0.dataType == LongType && f1.dataType == LongType &&
          f2.dataType == DoubleType => ()
    case other => throw new IllegalArgumentException(
      s"graft_bottomk expects struct<long, long, double>, got $other")
  }

  override def prettyName: String = "graft_bottomk"
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BottomKBuf = new BottomKBuf(k)

  override def update(b: BottomKBuf, input: InternalRow): BottomKBuf = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      if (!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2))
        b.insert(r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    b
  }

  override def merge(b: BottomKBuf, o: BottomKBuf): BottomKBuf = {
    var i = 0
    while (i < o.filled) { b.insert(o.hs(i), o.ids(i), o.vs(i)); i += 1 }
    b
  }

  override def eval(b: BottomKBuf): Any =
    new GenericArrayData(Array.tabulate[Any](b.filled)(i =>
      InternalRow(b.hs(i), b.ids(i), b.vs(i))))

  override def serialize(b: BottomKBuf): Array[Byte] = {
    val out = new Array[Byte](8 + 24 * b.filled)
    val buf = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0, b.k)
    buf.putInt(4, b.filled)
    var i = 0
    while (i < b.filled) {
      buf.putLong(8 + 24 * i, b.hs(i))
      buf.putLong(16 + 24 * i, b.ids(i))
      buf.putDouble(24 + 24 * i, b.vs(i))
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuf = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val b = new BottomKBuf(buf.getInt(0))
    val filled = buf.getInt(4)
    var i = 0
    while (i < filled) {
      b.hs(i) = buf.getLong(8 + 24 * i)
      b.ids(i) = buf.getLong(16 + 24 * i)
      b.vs(i) = buf.getDouble(24 + 24 * i)
      i += 1
    }
    b.filled = filled
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKStructAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKStructAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BottomKStructAgg =
    copy(child = c)
}

object BottomKStructAgg {
  @volatile private var registered = Set.empty[String]

  def register(spark: SparkSession): Unit = {
    val id = spark.sessionState.toString
    if (!registered.contains(id)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bottomk",
        exprs => {
          val k = exprs(1).eval(null).asInstanceOf[Int]
          BottomKStructAgg(exprs(0), k).toAggregateExpression()
        }, "scala_udf")
      registered += id
    }
  }

  /** Aggregate column: bounded bottom-k of `struct(h, id, v)` items. */
  def bottomK(spark: SparkSession, item: Column, k: Int): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{call_function, lit}
    call_function("graft_bottomk", item, lit(k))
  }
}

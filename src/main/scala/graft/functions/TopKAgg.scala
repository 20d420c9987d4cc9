package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a size-k insertion window sorted lexicographically
  * by (negScore asc, id asc) — the same ordering
  * `array_sort(collect_list(struct(negScore, id)))` produces, held in O(k)
  * instead of O(group). */
final class TopKBuf(val k: Int) {
  val negs = new Array[Double](k)
  val ids = new Array[Long](k)
  var filled = 0

  private def before(a: Double, ia: Long, b: Double, ib: Long): Boolean =
    a < b || (a == b && ia < ib)

  def insert(neg: Double, id: Long): Unit =
    if (filled < k || before(neg, id, negs(k - 1), ids(k - 1))) {
      var pos = if (filled < k) filled else k - 1
      while (pos > 0 && before(neg, id, negs(pos - 1), ids(pos - 1))) {
        negs(pos) = negs(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
      }
      negs(pos) = neg; ids(pos) = id
      if (filled < k) filled += 1
    }
}

/** O(k)-state top-k aggregate over `struct<negScore: double, id: long>`
  * rows, returning the k lexicographically smallest structs in sorted
  * order — exactly `slice(array_sort(collect_list(item)), 1, k)`, but with
  * bounded aggregation state and map-side partial merge: per-task memory
  * is k entries per group instead of the group's whole partition slice,
  * and one shuffle replaces the two-phase partial/merge dance. The shape
  * a 100 TB corpus × many-query top-k needs.
  *
  * Deterministic: the result is a function of the input SET (insertion
  * order cannot matter for a lexicographic bound), so any partitioning
  * and merge tree yields the same array. Inputs with duplicate
  * (negScore, id) pairs are deduplicated at the window boundary only —
  * all our pipelines carry unique ids per group. */
case class TopKStructAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] with UnaryLike[Expression] {

  require(k > 0, "k must be positive")
  child.dataType match {
    case StructType(Array(f0, f1))
        if f0.dataType == DoubleType && f1.dataType == LongType => ()
    case other => throw new IllegalArgumentException(
      s"graft_topk expects struct<double, long>, got $other")
  }

  override def prettyName: String = "graft_topk"
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      if (!r.isNullAt(0) && !r.isNullAt(1)) b.insert(r.getDouble(0), r.getLong(1))
    }
    b
  }

  override def merge(b: TopKBuf, o: TopKBuf): TopKBuf = {
    var i = 0
    while (i < o.filled) { b.insert(o.negs(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuf): Any =
    new GenericArrayData(Array.tabulate[Any](b.filled)(i =>
      InternalRow(b.negs(i), b.ids(i))))

  override def serialize(b: TopKBuf): Array[Byte] = {
    val out = new Array[Byte](8 + 16 * b.filled)
    val buf = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0, b.k)
    buf.putInt(4, b.filled)
    var i = 0
    while (i < b.filled) {
      buf.putDouble(8 + 16 * i, b.negs(i))
      buf.putLong(16 + 16 * i, b.ids(i))
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val b = new TopKBuf(buf.getInt(0))
    val filled = buf.getInt(4)
    var i = 0
    while (i < filled) {
      b.negs(i) = buf.getDouble(8 + 16 * i)
      b.ids(i) = buf.getLong(16 + 16 * i)
      i += 1
    }
    b.filled = filled
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKStructAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStructAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TopKStructAgg =
    copy(child = c)
}

object TopKStructAgg {
  @volatile private var registered = Set.empty[String]

  def register(spark: SparkSession): Unit = {
    val id = spark.sessionState.toString
    if (!registered.contains(id)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_topk",
        exprs => {
          val k = exprs(1).eval(null).asInstanceOf[Int]
          TopKStructAgg(exprs(0), k).toAggregateExpression()
        }, "scala_udf")
      registered += id
    }
  }

  /** Aggregate column: bounded top-k of `struct(negScore, id)` items. */
  def topK(spark: SparkSession, item: Column, k: Int): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{call_function, lit}
    call_function("graft_topk", item, lit(k))
  }
}

package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Sorted long-set columns packed as flat binary blobs: an array<bigint>
  * costs per-element handling at every row copy boundary (joins, exchanges,
  * generates), while a binary column is one memcpy. Pack once in the
  * projection, merge per pair. */
object PackedLongs {

  case class PackLongsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_pack_longs"
    override protected def nullSafeEval(a: Any): Any =
      pack(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.PackedLongs.pack($a)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class PackedIntersectSizeExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_packed_intersect_size"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.PackedLongs.intersect($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  def packSortedSet(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val v = new Array[Long](n)
    var i = 0
    while (i < n) { v(i) = a.getLong(i); i += 1 }
    java.util.Arrays.sort(v)
    var m = 0
    i = 0
    while (i < n) {
      if (m == 0 || v(i) != v(m - 1)) { v(m) = v(i); m += 1 }
      i += 1
    }
    val out = new Array[Byte](m * 8)
    val buf = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    i = 0
    while (i < m) { buf.putLong(i * 8, v(i)); i += 1 }
    out
  }

  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n * 8)
    val buf = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { buf.putLong(i * 8, a.getLong(i)); i += 1 }
    out
  }

  /** Sort + dedupe + pack in one pass: binary sorted-set form of an
    * array<bigint>, ready for two-pointer merges. */
  case class PackSortedSetExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_pack_sorted_set"
    override protected def nullSafeEval(a: Any): Any =
      packSortedSet(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.PackedLongs.packSortedSet($a)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class PackedEqCountExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_packed_eq_count"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      eqCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.PackedLongs.eqCount($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Positional equality count over two equal-length packed-long vectors
    * (MinHash signature agreement). */
  def eqCount(a: Array[Byte], b: Array[Byte]): Int = {
    val ba = ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val n = math.min(a.length, b.length) / 8
    var i = 0
    var c = 0
    while (i < n) {
      if (ba.getLong(i * 8) == bb.getLong(i * 8)) c += 1
      i += 1
    }
    c
  }

  /** Two-pointer intersection size over sorted packed longs. */
  def intersect(a: Array[Byte], b: Array[Byte]): Int = {
    val ba = ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val na = a.length / 8
    val nb = b.length / 8
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = ba.getLong(i * 8)
      val y = bb.getLong(j * 8)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  @volatile private var registered = Set.empty[String]

  def register(spark: SparkSession): Unit = {
    val id = spark.sessionState.toString
    if (!registered.contains(id)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_pack_longs", exprs => PackLongsExpr(exprs(0)), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_pack_sorted_set", exprs => PackSortedSetExpr(exprs(0)), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_packed_intersect_size",
        exprs => PackedIntersectSizeExpr(exprs(0), exprs(1)), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_packed_eq_count",
        exprs => PackedEqCountExpr(exprs(0), exprs(1)), "scala_udf")
      registered += id
    }
  }

  def pack(spark: SparkSession, a: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_pack_longs", a)
  }

  def packSortedSet(spark: SparkSession, a: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_pack_sorted_set", a)
  }

  def intersectSize(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_packed_intersect_size", a, b)
  }

  def eqCount(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_packed_eq_count", a, b)
  }
}

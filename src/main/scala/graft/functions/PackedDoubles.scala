package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Double vectors packed as flat binary blobs for pairwise similarity
  * joins: array<double> columns pay per-element costs at every row-copy
  * boundary and their zip_with/aggregate folds evaluate interpreted per
  * pair. The dot kernel is bit-identical to the sequential left fold
  * aggregate(zip_with(a, b, *), 0.0, +). */
object PackedDoubles {

  case class PackDoublesExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_pack_doubles"
    override protected def nullSafeEval(a: Any): Any =
      pack(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.PackedDoubles.pack($a)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class PackedDotExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_packed_dot"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PackedDoubles.dot($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n * 8)
    val buf = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { buf.putDouble(i * 8, a.getDouble(i)); i += 1 }
    out
  }

  /** Sequential left-fold dot product over packed doubles. */
  def dot(a: Array[Byte], b: Array[Byte]): Double = {
    val ba = ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val n = math.min(a.length, b.length) / 8
    var acc = 0.0
    var i = 0
    while (i < n) { acc = acc + ba.getDouble(i * 8) * bb.getDouble(i * 8); i += 1 }
    acc
  }

  @volatile private var registered = Set.empty[String]

  def register(spark: SparkSession): Unit = {
    val id = spark.sessionState.toString
    if (!registered.contains(id)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_pack_doubles", exprs => PackDoublesExpr(exprs(0)), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_packed_dot",
        exprs => PackedDotExpr(exprs(0), exprs(1)), "scala_udf")
      registered += id
    }
  }

  def packCol(spark: SparkSession, a: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_pack_doubles", a)
  }

  def dotCol(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_packed_dot", a, b)
  }
}

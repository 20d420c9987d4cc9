package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Nearest-centroid assignment as ONE expression over the whole centroid
  * matrix (rides along as a task-broadcast reference object): the
  * per-cell-literal alternative builds nCells × dim literal expressions
  * per row, which is pathological at real IVF sizes (4k–65k cells).
  *
  * Semantics are bit-identical to the declarative argmin it replaces:
  * sequential-fold dot products (left fold from 0.0) and ties resolved to
  * the smallest cell id (cells are iterated in ascending id order with a
  * strict comparison).
  */
case class NearestCellExpr(child: Expression, cells: Array[Int],
    flat: Array[Double], dim: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"

  def compute(v: ArrayData): Int = {
    val n = math.min(v.numElements(), dim)
    var best = cells(0)
    var bestNeg = Double.PositiveInfinity
    var c = 0
    while (c < cells.length) {
      var acc = 0.0
      var i = 0
      val off = c * dim
      while (i < n) { acc = acc + v.getDouble(i) * flat(off + i); i += 1 }
      val neg = -1.0 * acc
      if (neg < bestNeg) { bestNeg = neg; best = cells(c) }
      c += 1
    }
    best
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCell", this,
      classOf[NearestCellExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestCellExpr {
  @volatile private var registered = Set.empty[String]

  def register(spark: SparkSession): Unit = {
    val id = spark.sessionState.toString
    if (!registered.contains(id)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_nearest_cell",
        exprs => {
          def litArr(e: Expression): ArrayData =
            e.eval(null).asInstanceOf[ArrayData] // foldable literal args
          val cells = litArr(exprs(1)).toIntArray()
          val flat = litArr(exprs(2)).toDoubleArray()
          val dim = exprs(3).eval(null).asInstanceOf[Int]
          NearestCellExpr(exprs(0), cells, flat, dim)
        }, "scala_udf")
      registered += id
    }
  }

  /** Column form: argmin cell for a double-array vector column. */
  def nearestCell(spark: SparkSession, v: Column,
      centroids: Seq[(Int, Seq[Double])]): Column = {
    register(spark)
    val dim = centroids.head._2.length
    val flat = centroids.flatMap(_._2).toArray
    import org.apache.spark.sql.functions.{call_function, lit, typedlit}
    call_function("graft_nearest_cell", v,
      typedlit(centroids.map(_._1)), typedlit(flat.toSeq), lit(dim))
  }
}

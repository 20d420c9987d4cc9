package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-size kernel for the compression-ratio quality signal
  * (SURVEY.md §2.11 L116): the DEFLATE length of a document's UTF-8
  * bytes at a fixed level — template/boilerplate/repetitive text
  * compresses far below prose, which makes compressed-size/raw-size one
  * of the cheapest useful redundancy signals in web-corpus curation
  * (the zlib-ratio filter deployed alongside Gopher rules; cf. Rae et
  * al. 2021's repetition family — this is its codec-level sibling).
  *
  * One static-call codegen expression (the TextHashExprs discipline —
  * no UDF, stays inside the whole-stage span); a per-thread Deflater is
  * reused via ThreadLocal because constructing one per row measurably
  * dominates small documents. Deterministic for a given input on a
  * given zlib build — a kernel signal, not an oracle-replicable one, so
  * its evidence is spec pins (monotonicity, determinism, partition
  * invariance), not a DuckDB gate.
  */
object CompressExprs {

  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  /** DEFLATE(level 6, raw) byte length of the UTF-8 input. */
  def deflateSize(s: UTF8String): Int = {
    val in = s.getBytes
    val d = deflaters.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  case class DeflateSizeExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_deflate_size"
    override protected def nullSafeEval(a: Any): Any =
      CompressExprs.deflateSize(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        a => s"graft.functions.CompressExprs.deflateSize($a)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  @volatile private var registered = Set.empty[String]

  private def register(spark: SparkSession): Unit = {
    val id = spark.sessionState.toString
    if (!registered.contains(id)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_deflate_size", exprs => DeflateSizeExpr(exprs(0)), "scala_udf")
      registered += id
    }
  }

  def deflateSizeCol(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_deflate_size", text)
  }
}

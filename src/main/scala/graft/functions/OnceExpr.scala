package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, With}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Single-evaluation common-subexpression binding for Column trees.
  *
  * `Once.once(c)(f)` evaluates `c` exactly once however many times `f`
  * references it, by lowering to catalyst's `With` expression — the same
  * node Spark 4 rewrites `nullif`/`ifnull` through; the optimizer's
  * RewriteWithExpression splits it into stacked projections. Column-tree
  * duplication otherwise multiplies real work: a null-guard
  * `when(x === "", null).otherwise(x)` evaluates `x` twice and chained
  * guards multiply — the adtl date gate measured 19 date-parses per row
  * from exactly this shape (round 15).
  *
  * `With` requires RESOLVED children (CommonExpressionDef.dataType is
  * called during analysis), so it cannot be built at Column-construction
  * time; instead the body references the bound value through a
  * passthrough [[OnceMarker]] and a registered function builder — which
  * the analyzer invokes bottom-up, children already resolved — swaps the
  * markers for the `With` ref. A marker that somehow survives (it never
  * should) still evaluates its child: semantics identical, only the
  * sharing is lost. */
case class OnceMarker(child: Expression, id: String) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_once_marker"
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Once {
  @volatile private var registered = Set.empty[String]

  private def register(spark: SparkSession): Unit = {
    val id = spark.sessionState.toString
    if (!registered.contains(id)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_once_marker",
        exprs => {
          val mid = exprs(1).eval(null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          OnceMarker(exprs(0), mid.toString)
        }, "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_once",
        exprs => {
          val mid = exprs(2).eval(null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
          val common = exprs(0)
          val body = exprs(1)
          With(common) { refs =>
            body.transformUp {
              case m: OnceMarker if m.id == mid => refs.head
            }
          }
        }, "scala_udf")
      registered += id
    }
  }

  /** Bind `c` once; every reference `f` makes to its argument reads the
    * single bound value. The session is taken from any active session —
    * callers inside query builders always have one. */
  def once(c: Column)(f: Column => Column): Column = {
    val spark = SparkSession.active
    register(spark)
    import org.apache.spark.sql.functions.{call_function, lit}
    val mid = java.util.UUID.randomUUID().toString
    val marker = call_function("graft_once_marker", c, lit(mid))
    call_function("graft_once", c, f(marker), lit(mid))
  }
}

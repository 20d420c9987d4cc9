package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen expression — Spark has no
  * built-in normalizer, yet any corpus mixing sources needs one:
  * decomposed sequences ("e" + U+0301) and their composed forms ("é")
  * hash differently, so exact dedup, fingerprinting, MinHash and
  * tokenization all silently treat equal-looking text as distinct until
  * the corpus is normalized. NFC is the canonical-composition form
  * (UAX #15); `java.text.Normalizer` implements the same Unicode
  * algorithm as DuckDB's utf8proc `nfc_normalize`, which is what lets
  * the gate compare md5 of the normalized bytes across engines. */
object UnicodeExprs {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan; most text is
    // already NFC and skips the allocation entirely
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_nfc_normalize"
    override protected def nullSafeEval(a: Any): Any =
      nfc(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.UnicodeExprs.nfc($a)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  @volatile private var registered = Set.empty[String]

  def register(spark: SparkSession): Unit = {
    val id = spark.sessionState.toString
    if (!registered.contains(id)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_nfc_normalize", exprs => NfcNormalizeExpr(exprs(0)), "scala_udf")
      registered += id
    }
  }

  def nfcNormalize(spark: SparkSession, s: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_nfc_normalize", s)
  }
}

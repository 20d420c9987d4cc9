package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native codegen Catalyst expression.
  *
  * Spark ships `levenshtein` but no Jaro–Winkler; record-linkage practice
  * wants both (JW weights shared prefixes — the name/typo regime — where
  * edit distance weights every position equally). Implemented to the
  * standard published definition (Winkler 1990), which is also what
  * DuckDB/rapidfuzz compute, so the oracle gate can hash-compare:
  *
  *  - match window = ⌊max(|a|,|b|)/2⌋ − 1 (floored at 0), greedy
  *    left-to-right matching, each position used once;
  *  - transpositions = half the mismatched positions between the two
  *    matched subsequences;
  *  - jaro = (m/|a| + m/|b| + (m−t)/m)/3; m = 0 ⇒ 0; either side
  *    empty ⇒ 0 (the rapidfuzz/DuckDB convention, incl. both empty);
  *  - winkler boost only when jaro > 0.7: jw = jaro + ℓ·0.1·(1−jaro)
  *    with ℓ = common-prefix length capped at 4. Case-sensitive.
  *
  * One JIT-friendly loop per pair, O(|a|·window) time, two boolean
  * scratch arrays — runs inside whole-stage codegen via the static
  * kernel (same shape as [[TextHashExprs]]).
  */
object JaroWinklerExpr {

  @volatile private var registered = Set.empty[String]

  private def register(spark: SparkSession): Unit = {
    val id = spark.sessionState.toString
    if (!registered.contains(id)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_jaro_winkler",
        exprs => JaroWinklerSim(exprs(0), exprs(1)), "scala_udf")
      registered += id
    }
  }

  /** jaro_winkler(a, b) ∈ [0, 1] as a Column (DoubleType). */
  def jaroWinkler(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_jaro_winkler", a, b)
  }

  case class JaroWinklerSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaro_winkler"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      JaroWinklerExpr.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinklerExpr.sim($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Static kernel shared by interpreted eval and generated code. Works
    * on UTF-16 code units (identical to per-codepoint for the ASCII/BMP
    * text in scope). */
  def sim(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](l1)
    val matched2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      val jEnd = math.min(i + window + 1, l2)
      var j = math.max(i - window, 0)
      var found = false
      while (j < jEnd && !found) {
        if (!matched2(j) && s2.charAt(j) == c) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - half) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val pMax = math.min(4, math.min(l1, l2))
    while (prefix < pMax && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

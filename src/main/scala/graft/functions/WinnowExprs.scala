package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003) as ONE codegen
  * expression: polynomial rolling hashes of the `k` code-point grams
  * (Horner base 31 mod 2^31-1 — plain integer arithmetic a SQL oracle
  * replicates exactly), then the minimum hash of each sliding window of `w`
  * consecutive gram hashes, deduplicated and sorted.
  *
  * The winnowing guarantee: two documents sharing any substring of at least
  * w + k - 1 code points share at least one fingerprint — the basis for
  * overlap/contamination detection at corpus scale (fingerprint density is
  * ~2/(w+1) per position, a fixed compression of the document).
  *
  * Hashes are computed once with a true O(n) rolling recurrence (subtract
  * the leading term, multiply, add the trailing code point — residues equal
  * the per-window Horner fold, which is what the oracle computes); window
  * minima use a monotone deque, so the whole kernel is O(n) per document.
  * Texts shorter than `k` yield the single hash of the whole text; empty
  * texts yield no fingerprints.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  private val P = 2147483647L
  private val B = 31L

  def compute(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val kk = math.min(k, n)
    val m = n - kk + 1
    val hs = new Array[Long](m)
    var h = 0L
    var j = 0
    while (j < kk) { h = (h * B + cps(j)) % P; j += 1 }
    hs(0) = h
    // B^(kk-1) mod P for the rolling subtraction
    var top = 1L
    j = 0
    while (j < kk - 1) { top = top * B % P; j += 1 }
    var i = 1
    while (i < m) {
      h = (h - cps(i - 1) * top % P + P) % P
      h = (h * B + cps(i + kk - 1)) % P
      hs(i) = h
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var mn = hs(0)
      i = 1
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      sel.add(mn)
    } else {
      // monotone deque of indices with non-decreasing hash values; the
      // front is the window minimum (equal values keep the earliest index,
      // which does not change the minimum VALUE we emit)
      val dq = new Array[Int](m)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < m) {
        while (tail > head && hs(dq(tail - 1)) > hs(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) sel.add(hs(dq(head)))
        i += 1
      }
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WinnowExprs {
  @volatile private var registered = Set.empty[String]

  def register(spark: SparkSession): Unit = {
    val id = spark.sessionState.toString
    if (!registered.contains(id)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_winnow",
        exprs => {
          def litInt(e: Expression): Int = e.eval(null).asInstanceOf[Int]
          WinnowExpr(exprs(0), litInt(exprs(1)), litInt(exprs(2)))
        }, "scala_udf")
      registered += id
    }
  }

  /** Column form: sorted distinct winnowed fingerprints of a text column. */
  def winnow(spark: SparkSession, text: Column, k: Int, w: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    register(spark)
    import org.apache.spark.sql.functions.{call_function, lit}
    call_function("graft_winnow", text, lit(k), lit(w))
  }
}

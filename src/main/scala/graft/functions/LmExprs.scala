package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Add-k bigram language-model scoring as ONE expression over the
  * task-broadcast reference model — the corpus side of
  * [[graft.ops.TextAnalysis.lmScore]] with zero joins and zero shuffles.
  *
  * The declarative alternative explodes every corpus bigram (~tokens-1
  * rows per doc), broadcast-joins the reference bigram and context tables
  * onto the instance stream, and re-aggregates by doc — three wide plan
  * stages whose instance stream is corpus-sized. Here the bounded
  * reference model (sorted bigram/context arrays, the same task-broadcast
  * pattern as [[NearestCellsTopKExpr]]'s centroid matrix) rides in the
  * expression, and each doc folds to `(n_bigrams, Σ logp)` in a single
  * narrow projection over one corpus scan.
  *
  * Bit-identical to the joined form: per-bigram
  * `logp = ln((cnt2 + k) / (ctx + k·(V+1)))` with `java.lang.Math.log`
  * (what Spark's `log` uses), each term cast to DECIMAL(28,14) exactly as
  * Spark's double→decimal cast does (`BigDecimal.valueOf` — the
  * `Double.toString` shortest form — then HALF_UP at scale 14), summed
  * exactly (decimal addition is order-invariant, so the fold order the
  * joined aggregation never guaranteed cannot matter).
  *
  * Lookups binary-search sorted `(w1, w2)` byte arrays in UTF8String
  * order (unsigned byte-wise — `Arrays.compareUnsigned` driver-side and
  * `UTF8String.compareTo` executor-side agree), so per-task init only
  * wraps the arrays (no hash build) and per-bigram lookup allocates
  * nothing.
  */
case class LmScoreExpr(child: Expression,
    bgW1: Array[Array[Byte]], bgW2: Array[Array[Byte]], bgCnt: Array[Long],
    ctxW1: Array[Array[Byte]], ctxCnt: Array[Long],
    addK: Double, denomK: Double) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("logp_sum", DecimalType(38, 14), nullable = true)))
  override def prettyName: String = "graft_lm_score"

  // wrapper views over the serialized byte arrays, built once per task
  @transient private lazy val bgW1U = bgW1.map(UTF8String.fromBytes)
  @transient private lazy val bgW2U = bgW2.map(UTF8String.fromBytes)
  @transient private lazy val ctxW1U = ctxW1.map(UTF8String.fromBytes)

  private def bigramCount(w1: UTF8String, w2: UTF8String): Long = {
    var lo = 0
    var hi = bgW1U.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      var c = w1.compareTo(bgW1U(mid))
      if (c == 0) c = w2.compareTo(bgW2U(mid))
      if (c == 0) return bgCnt(mid)
      else if (c < 0) hi = mid - 1
      else lo = mid + 1
    }
    0L
  }

  private def ctxCount(w1: UTF8String): Long = {
    var lo = 0
    var hi = ctxW1U.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = w1.compareTo(ctxW1U(mid))
      if (c == 0) return ctxCnt(mid)
      else if (c < 0) hi = mid - 1
      else lo = mid + 1
    }
    0L
  }

  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    if (n < 2) return new GenericInternalRow(Array[Any](0L, null))
    var sum = JBigDecimal.ZERO
    var w1 = toks.getUTF8String(0)
    var i = 0
    while (i < n - 1) {
      val w2 = toks.getUTF8String(i + 1)
      val logp = Math.log(
        (bigramCount(w1, w2).toDouble + addK) /
          (ctxCount(w1).toDouble + denomK))
      sum = sum.add(JBigDecimal.valueOf(logp).setScale(14, RoundingMode.HALF_UP))
      w1 = w2
      i += 1
    }
    new GenericInternalRow(Array[Any]((n - 1).toLong, Decimal(sum, 38, 14)))
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmScore", this, classOf[LmScoreExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LmExprs {
  @volatile private var registered = Set.empty[String]

  /** Build the sorted reference model from collected (bigram, count) rows.
    * Bigrams split at the first space byte (tokens are whitespace-split,
    * so the separator is unambiguous and single-byte in UTF-8); the
    * context table ctx(w1) = Σ_w c(w1 w) is derived here — the reference
    * is bounded, so this is driver-scale work. */
  private[functions] def build(child: Expression, bigrams: Array[UTF8String],
      counts: Array[Long], addK: Double, vocab: Long): LmScoreExpr = {
    val n = bigrams.length
    val w1s = new Array[Array[Byte]](n)
    val w2s = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val b = bigrams(i).getBytes
      var sp = 0
      while (sp < b.length && b(sp) != ' '.toByte) sp += 1
      w1s(i) = java.util.Arrays.copyOfRange(b, 0, sp)
      w2s(i) = java.util.Arrays.copyOfRange(b, math.min(sp + 1, b.length), b.length)
      i += 1
    }
    def cmpPair(a: Int, b: Int): Int = {
      val c = java.util.Arrays.compareUnsigned(w1s(a), w1s(b))
      if (c != 0) c else java.util.Arrays.compareUnsigned(w2s(a), w2s(b))
    }
    val order = Array.range(0, n).sortWith(cmpPair(_, _) < 0)
    val sw1 = order.map(w1s); val sw2 = order.map(w2s); val sc = order.map(counts)
    // context sums over runs of equal w1 in the already-sorted order
    val cw1 = Array.newBuilder[Array[Byte]]
    val cc = Array.newBuilder[Long]
    var s = 0
    while (s < n) {
      var e = s
      var acc = 0L
      while (e < n && java.util.Arrays.compareUnsigned(sw1(s), sw1(e)) == 0) {
        acc += sc(e); e += 1
      }
      cw1 += sw1(s); cc += acc
      s = e
    }
    LmScoreExpr(child, sw1, sw2, sc, cw1.result(), cc.result(),
      addK, addK * (vocab.toDouble + 1.0))
  }

  def register(spark: SparkSession): Unit = {
    val id = spark.sessionState.toString
    if (!registered.contains(id)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_lm_score",
        exprs => {
          val arr = exprs(1).eval(null).asInstanceOf[ArrayData]
          val bigrams = (0 until arr.numElements())
            .map(arr.getUTF8String).toArray
          val counts = exprs(2).eval(null).asInstanceOf[ArrayData].toLongArray()
          val addK = exprs(3).eval(null).asInstanceOf[Double]
          val vocab = exprs(4).eval(null).asInstanceOf[Long]
          build(exprs(0), bigrams, counts, addK, vocab)
        }, "scala_udf")
      registered += id
    }
  }

  /** Column form: `(n_bigrams, logp_sum)` struct for a token-array column
    * against the collected reference bigram counts. */
  def lmScoreCol(spark: SparkSession, toks: Column, bigrams: Seq[String],
      counts: Seq[Long], addK: Double, vocab: Long): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{call_function, lit, typedlit}
    call_function("graft_lm_score", toks,
      typedlit(bigrams), typedlit(counts), lit(addK), lit(vocab))
  }
}

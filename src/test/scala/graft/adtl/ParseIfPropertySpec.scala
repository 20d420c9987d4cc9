package graft.adtl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.util.Random

/** Differential testing of the compiled `if` predicates: a direct Scala
  * model of the reference's parse_if semantics (cast-to-literal-type,
  * failed cast → false, anchored case-insensitive regex, truthiness for
  * bool literals, any/all/not) is evaluated row-by-row and compared against
  * the Catalyst-compiled Column on the same rows. Seeded, so failures
  * reproduce. */
class ParseIfPropertySpec extends SparkSpec {

  private val fields = Vector("f1", "f2", "f3")
  private val valuePool = Vector(
    "", "0", "1", "42", "-3", "4.5", "-0.5", "abc", "Yes", "YES", " 7 ",
    "1e2", "cough present", "2022-01-05", "0.0", "007", "+42", ".5",
    "nan", "inf", "-inf")

  // ---- the model (reference semantics in plain Scala) -------------------

  private def pyInt(s: String): Option[Long] = {
    val t = s.trim
    if (t.matches("[-+]?\\d+")) Some(t.toLong) else None
  }
  private def pyFloat(s: String): Option[Double] = {
    val t = s.trim
    // Python (and Spark's cast) accept inf/infinity/nan spellings that
    // Java's Double.parseDouble does not
    t.toLowerCase match {
      case "inf" | "+inf" | "infinity" | "+infinity" => Some(Double.PositiveInfinity)
      case "-inf" | "-infinity" => Some(Double.NegativeInfinity)
      case "nan" | "+nan" | "-nan" => Some(Double.NaN)
      case _ => try Some(t.toDouble) catch { case _: NumberFormatException => None }
    }
  }

  sealed trait Cond
  case class Cmp(field: String, op: String, value: Any, ci: Boolean) extends Cond
  case class AnyOf(cs: List[Cond]) extends Cond
  case class AllOf(cs: List[Cond]) extends Cond
  case class NotOf(c: Cond) extends Cond

  private def evalModel(c: Cond, row: Map[String, String]): Boolean = c match {
    case AnyOf(cs) => cs.exists(evalModel(_, row))
    case AllOf(cs) => cs.forall(evalModel(_, row))
    case NotOf(s) => !evalModel(s, row)
    case Cmp(f, op, v, ci) =>
      val raw0 = row(f)
      val raw = if (ci) raw0.toLowerCase else raw0
      (op, v) match {
        case ("=~", p: String) =>
          java.util.regex.Pattern.compile(p,
            java.util.regex.Pattern.CASE_INSENSITIVE).matcher(raw).lookingAt()
        case (_, b: Boolean) => cmp(op, raw.nonEmpty, b)
        case (_, l: Long) => pyInt(raw).exists(x => cmp(op, x, l))
        case (_, d: Double) =>
          // IEEE semantics (Python): NaN comparisons false except !=
          pyFloat(raw).exists(x => op match {
            case ">" => x > d
            case ">=" => x >= d
            case "<" => x < d
            case "<=" => x <= d
            case "!=" => x != d
            case "=" | "==" => x == d
          })
        case (_, s: String) => cmp(op, raw, s)
      }
  }

  private def cmp[T: Ordering](op: String, a: T, b: T): Boolean = {
    val ord = implicitly[Ordering[T]]
    op match {
      case ">" => ord.gt(a, b)
      case ">=" => ord.gteq(a, b)
      case "<" => ord.lt(a, b)
      case "<=" => ord.lteq(a, b)
      case "!=" => a != b
      case "=" | "==" => a == b
    }
  }
  private implicit val boolOrd: Ordering[Boolean] = Ordering.Boolean

  // ---- generators -------------------------------------------------------

  private def genCond(rng: Random, depth: Int): Cond = {
    val roll = rng.nextInt(10)
    if (depth < 2 && roll < 2) AnyOf(List.fill(1 + rng.nextInt(2))(genCond(rng, depth + 1)))
    else if (depth < 2 && roll < 4) AllOf(List.fill(1 + rng.nextInt(2))(genCond(rng, depth + 1)))
    else if (depth < 2 && roll < 5) NotOf(genCond(rng, depth + 1))
    else {
      val f = fields(rng.nextInt(fields.length))
      val ops = Vector(">", ">=", "<", "<=", "!=", "=", "==")
      rng.nextInt(5) match {
        case 0 => Cmp(f, ops(rng.nextInt(ops.length)), rng.between(-5L, 50L), ci = false)
        case 1 => Cmp(f, ops(rng.nextInt(ops.length)),
          math.round(rng.between(-5.0, 10.0) * 10) / 10.0, ci = false)
        case 2 => Cmp(f, ops(rng.nextInt(ops.length)),
          valuePool(rng.nextInt(valuePool.length)), rng.nextBoolean())
        case 3 => Cmp(f, "=", rng.nextBoolean(), ci = false)
        case 4 => Cmp(f, "=~", Vector("co.gh", "^ye?s", "4.*", "\\d+")(rng.nextInt(4)), ci = false)
      }
    }
  }

  private def toRaw(c: Cond): Spec.Raw = c match {
    case AnyOf(cs) => Map("any" -> cs.map(toRaw))
    case AllOf(cs) => Map("all" -> cs.map(toRaw))
    case NotOf(s) => Map("not" -> toRaw(s))
    case Cmp(f, op, v, ci) =>
      val base: Spec.Raw =
        if (op == "=" && !v.isInstanceOf[String]) Map(f -> v)
        else Map(f -> Map(op -> v))
      if (ci) base + ("caseInsensitive" -> true) else base
  }

  test("compiled if-predicates match the reference model on random rules and rows") {
    val rng = new Random(20260812L)
    val rows = (0 until 60).map { _ =>
      fields.map(_ => valuePool(rng.nextInt(valuePool.length)))
    }
    val schema = StructType(fields.map(f => StructField(f, StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*)), 2), schema)

    val header = Spec.Header(Map("name" -> "p", "description" -> "p",
      "tables" -> Map("t" -> Map("kind" -> "oneToOne"))))
    val compiler = new RuleCompiler(fields, header, Set.empty,
      Transformations.newRegistry(), Uuid5.NamespaceDns)

    val conds = (0 until 60).map(_ => genCond(rng, 0))
    import org.apache.spark.sql.functions._
    val outCols = conds.zipWithIndex.map { case (c, i) =>
      coalesce(compiler.compileIf(toRaw(c)), lit(false)).as(s"c$i")
    }
    val got = df.select(outCols: _*).collect()
    var mismatches = List.empty[String]
    rows.zipWithIndex.foreach { case (r, ri) =>
      val rowMap = fields.zip(r).toMap
      conds.zipWithIndex.foreach { case (c, ci) =>
        val want = evalModel(c, rowMap)
        val g = got(ri).getBoolean(ci)
        if (g != want) mismatches ::= s"row=$rowMap cond=$c got=$g want=$want"
      }
    }
    assert(mismatches.isEmpty,
      s"${mismatches.length} mismatches, first: ${mismatches.headOption.getOrElse("")}")
  }
}

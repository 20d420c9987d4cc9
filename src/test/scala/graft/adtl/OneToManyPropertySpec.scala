package graft.adtl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.util.Random

/** Differential testing of oneToMany emission (parser.py:516-535): per
  * input row, each match entry whose `if` passes emits one output row with
  * the entry's (plus common) attributes through the value pipeline. The
  * model evaluates predicates and values directly; outputs compare as
  * rendered row multisets. */
class OneToManyPropertySpec extends SparkSpec {

  private val fields = Vector("h1", "h2", "h3")
  private val valuePool = Vector("", "0", "1", "2", "42", "4.5", "abc", "Yes", "007")

  private def pyAuto(s: String): Any =
    if (s.matches("[-+]?\\d+")) s.toLong
    else try s.toDouble catch { case _: NumberFormatException => s }
  private def pyRender(v: Any): String = v match {
    case null => null
    case b: Boolean => if (b) "True" else "False"
    case l: Long => l.toString
    case d: Double => if (d == math.floor(d) && !d.isInfinite) s"${d.toLong}.0" else d.toString
    case s: String => s
  }

  private case class Entry(name: String, ifField: String, ifOp: String, ifVal: Any,
      valField: String, valuesMap: Option[Map[String, Any]])

  private def genEntry(rng: Random, i: Int): Entry = {
    val ops = Vector("=", "!=", ">", "<")
    val ifVal: Any = rng.nextInt(3) match {
      case 0 => valuePool(1 + rng.nextInt(valuePool.length - 1))
      case 1 => rng.between(-2L, 45L)
      case 2 => math.round(rng.between(-1.0, 6.0) * 10) / 10.0
    }
    Entry(s"e$i", fields(rng.nextInt(fields.length)), ops(rng.nextInt(ops.length)), ifVal,
      fields(rng.nextInt(fields.length)),
      if (rng.nextBoolean()) Some(Map("1" -> "yes", "0" -> "no")) else None)
  }

  private def evalIf(e: Entry, row: Map[String, String]): Boolean = {
    val raw = row(e.ifField)
    e.ifVal match {
      case s: String => e.ifOp match {
        case "=" => raw == s
        case "!=" => raw != s
        case ">" => raw > s
        case "<" => raw < s
      }
      case l: Long =>
        if (!raw.trim.matches("[-+]?\\d+")) false
        else {
          val x = raw.trim.toLong
          e.ifOp match {
            case "=" => x == l; case "!=" => x != l; case ">" => x > l; case "<" => x < l
          }
        }
      case d: Double =>
        (try Some(raw.trim.toDouble) catch { case _: NumberFormatException => None }) match {
          case None => false
          case Some(x) => e.ifOp match {
            case "=" => x == d; case "!=" => x != d; case ">" => x > d; case "<" => x < d
          }
        }
    }
  }

  private def evalValue(e: Entry, row: Map[String, String]): String = {
    val raw = row(e.valField)
    e.valuesMap match {
      case Some(m) =>
        if (raw.isEmpty) null
        else m.get(raw) match {
          case Some(v) => pyRender(v match { case s: String => s; case other => other })
          case None => null
        }
      case None => if (raw.isEmpty) null else raw
    }
  }

  test("oneToMany emission matches the reference model on random specs and rows") {
    val rng = new Random(31337L)
    val entries = (0 until 8).map(genEntry(rng, _))
    val entryJson = entries.map { e =>
      val ifJson = e.ifVal match {
        case s: String => s""""${e.ifField}": {"${e.ifOp}": "$s"}"""
        case other => s""""${e.ifField}": {"${e.ifOp}": $other}"""
      }
      val valJson = e.valuesMap match {
        case Some(m) =>
          val ms = m.map { case (k, v) => s""""$k": ${v match {
            case s: String => s""""$s""""
            case other => other.toString
          }}""" }.mkString(", ")
          s"""{"field": "${e.valField}", "values": {$ms}}"""
        case None => s"""{"field": "${e.valField}"}"""
      }
      s"""{"if": {$ifJson}, "name": "${e.name}", "val": $valJson}"""
    }.mkString("[", ",", "]")
    val spec =
      s"""{"adtl": {"name": "s", "description": "d",
          "tables": {"obs": {"kind": "oneToMany", "discriminator": "name", "common": {"ds": "D"}}}},
          "obs": $entryJson}"""

    val rows = (0 until 80).map(_ => fields.map(_ => valuePool(rng.nextInt(valuePool.length))))
    val schema = StructType(fields.map(f => StructField(f, StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*)), 2), schema)

    val got = AdtlParser.fromJsonString(spec).parseDataFrame(spark, df)("obs")
      .collect()
      .map(r => (r.getAs[String]("ds"), r.getAs[String]("name"), r.getAs[String]("val")))
      .toList.sorted(Ordering.Tuple3(Ordering.String,
        Ordering.String, NullFirst.nullFirstString))

    val want = rows.flatMap { r =>
      val rowMap = fields.zip(r).toMap
      entries.collect {
        case e if evalIf(e, rowMap) => ("D", e.name, evalValue(e, rowMap))
      }
    }.toList.sorted(Ordering.Tuple3(Ordering.String,
      Ordering.String, NullFirst.nullFirstString))

    assert(got.length == want.length,
      s"row counts: got ${got.length}, want ${want.length}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"row $i: $g vs $w")
    }
  }

}

// null-safe string ordering for the sorted-multiset compare
private object NullFirst {
  implicit val nullFirstString: Ordering[String] =
    Ordering.fromLessThan[String]((a, b) =>
      (a, b) match {
        case (null, null) => false
        case (null, _) => true
        case (_, null) => false
        case (x, y) => x < y
      })
}

package graft.adtl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import Transformations.{PCol, PLit, PList, TCtx, TParam}

/** The reference's own test_transformations.py tables
  * (tests/test_adtl/test_transformations.py), run through the compiled
  * Column forms. Documented divergences: pass-through of unparseable
  * values is gated behind returnUnmatched (typed columns otherwise), and
  * correctOldDate's Python-datetime return mode has no Column analogue
  * (ISO strings only).
  */
class TransformationsGoldenSpec extends SparkSpec {

  private def toCol(v: Any) = v match {
    case null => lit(null).cast("string")
    case b: Boolean => lit(b).cast("string")
    case s: String => lit(s)
    case other => lit(other.toString)
  }

  private def run(fn: String, v: Any, ps: List[TParam], ru: Boolean = false): Any = {
    val c = Transformations.builtins(fn)(toCol(v), ps, TCtx(ru))
    val row = spark.range(1).select(c.as("r")).collect()(0)
    if (row.isNullAt(0)) null else row.get(0)
  }

  private def approx(a: Any, expected: Double, tol: Double = 1e-3): Unit = a match {
    case d: Double => assert(math.abs(d - expected) <= tol * math.abs(expected).max(1.0),
      s"$d !~ $expected")
    case other => fail(s"expected double ~ $expected, got $other")
  }

  test("isNotNull") {
    assert(run("isNotNull", "1", Nil) == true)
    assert(run("isNotNull", null, Nil) == false)
    assert(run("isNotNull", "", Nil) == false)
  }

  test("textIfNotNull") {
    assert(run("textIfNotNull", "2023-01-24", List(PLit("Ribavarin"))) == "Ribavarin")
    assert(run("textIfNotNull", true, List(PLit("Dexamethasone"))) == "Dexamethasone")
    assert(run("textIfNotNull", "", List(PLit("Prednisolone"))) == null)
    assert(run("textIfNotNull", null, List(PLit("Chloroquine"))) == null)
  }

  test("wordSubstituteSet") {
    def pairs(ps: (String, String)*): List[TParam] =
      ps.map { case (a, b) => PList(List(PLit(a), PLit(b))) }.toList
    def asList(a: Any): List[String] = a match {
      case s: scala.collection.Seq[_] => s.map(String.valueOf).toList
      case null => null
    }
    assert(asList(run("wordSubstituteSet",
      "Metilprednisolona - Dexametasona - Fluticasona",
      pairs("Metilprednisolona" -> "Methylprednisolone",
        "Fluticasona" -> "Fluticasone", "Dexametasona" -> "Dexamethasone"))) ==
      List("Dexamethasone", "Fluticasone", "Methylprednisolone"))
    assert(asList(run("wordSubstituteSet", "Hidrocortisona - Fluticasona",
      pairs("Hidrocortisona" -> "Hydrocortisone", "Fluticasona" -> "Fluticasone"))) ==
      List("Fluticasone", "Hydrocortisone"))
    assert(run("wordSubstituteSet", "Hidrocortisona - Fluticasona",
      pairs("Cortisona" -> "Cortisone")) == null)
    intercept[IllegalArgumentException] {
      run("wordSubstituteSet", "value", List(PLit(20), PLit(30)))
    }
  }

  test("Percentage") {
    approx(run("Percentage", "0.1", Nil), 10.0)
    approx(run("Percentage", "1", Nil), 100.0)
    approx(run("Percentage", "5", Nil), 5.0)
    approx(run("Percentage", "0.5", Nil), 50.0)
    // unparseable passes through under returnUnmatched (reference:
    // unconditional pass-through)
    assert(run("Percentage", "five", Nil, ru = true) == "five")
    assert(run("Percentage", "five", Nil) == null)
    assert(run("Percentage", null, Nil) == null)
  }

  test("yearsElapsed") {
    val ps = List(PLit("2023-02-22"), PLit(2022))
    approx(run("yearsElapsed", "1996-02-22", ps), 27.0)
    assert(run("yearsElapsed", "", ps) == null)
    assert(run("yearsElapsed", null, ps) == null)
    assert(run("yearsElapsed", "22/02/1996", ps) == null) // wrong format
    approx(run("yearsElapsed", "1950",
      List(PLit("2023-01-01 00:00"), PLit(2022), PLit("%Y"), PLit("%Y-%m-%d %H:%M"))), 73.0)
  }

  test("durationDays") {
    assert(run("durationDays", "2023-02-01", List(PLit("2023-03-05"))) == 32L)
    assert(run("durationDays", "", List(PLit("2023-02-22"))) == null)
    assert(run("durationDays", null, List(PLit("2023-02-22"))) == null)
  }

  test("startDate / endDate") {
    assert(run("startDate", "2023-02-01", List(PLit(10))) == "2023-01-22")
    assert(run("startDate", "", List(PLit("2023-02-22"))) == null)
    assert(run("startDate", null, List(PLit("2023-02-22"))) == null)
    assert(run("endDate", "2023-01-24", List(PLit(10))) == "2023-02-03")
    assert(run("endDate", "", List(PLit("2023-02-22"))) == null)
    assert(run("endDate", null, List(PLit("2023-02-22"))) == null)
  }

  test("getFloat") {
    def gf(v: Any, dec: Any = null, sep: Any = null, ru: Boolean = false): Any =
      run("getFloat", v, List(PLit(dec), PLit(sep)), ru)
    assert(gf(null) == null)
    assert(gf(false) == null)
    approx(gf("\" - 11 "), -11.0)
    approx(gf("\"3\""), 3.0)
    approx(gf("-3."), -3.0)
    approx(gf("\" 3.4 \""), 3.4)
    approx(gf("3,4", dec = ","), 3.4)
    approx(gf("1,234.5", sep = ","), 1234.5)
    approx(gf("1.234,5", dec = ",", sep = "."), 1234.5)
    approx(gf("1.567.923,66", dec = ",", sep = "."), 1567923.66)
    // two numeric fragments: unparseable; passes through under
    // returnUnmatched (reference: unconditional pass-through)
    assert(gf("\" -1+1\"", ru = true) == "-1+1")
    approx(gf(" -3 - Moderate Sedation"), -3.0)
  }

  test("makeDate") {
    def md(y: Any, m: Any, d: Any): Any =
      run("makeDate", y, List(PLit(m), PLit(d)))
    assert(md("", "", "") == null)
    assert(md("2020", "", "") == null)
    assert(md("", "13", "") == null)
    assert(md("2020", "05", "04") == "2020-05-04")
    assert(md("1999", "12", "44") == null)
    assert(md("2020", "May", "04") == null)
  }

  test("makeDateTimeFromSeconds") {
    def mdts(date: Any, secs: Any, fmt: String, tz: String): Any =
      run("makeDateTimeFromSeconds", date, List(PLit(secs), PLit(fmt), PLit(tz)))
    assert(mdts("", "41400", "%d/%m/%Y", "UTC") == null)
    assert(mdts("04/05/2020", "41400", "%d/%m/%Y", "UTC") == "2020-05-04T11:30:00+00:00")
    assert(mdts("04/05/2020", "", "%d/%m/%Y", "UTC") == "2020-05-04")
    assert(mdts("04/05/2020", "", "%m/%d/%Y", "UTC") == "2020-04-05")
    assert(mdts("04/05/2020", "", "%Y-%m-%d", "UTC") == null)
    assert(mdts("05/06/2020", "86399", "%d/%m/%Y", "UTC") == "2020-06-05T23:59:00+00:00")
    assert(mdts("05/06/2020", "86399", "%d/%m/%Y", "Asia/Tokyo") == "2020-06-05T23:59:00+09:00")
  }

  test("makeDateTime") {
    def mdt(date: Any, t: Any, fmt: String, tz: String): Any =
      run("makeDateTime", date, List(PLit(t), PLit(fmt), PLit(tz)))
    assert(mdt("", "00:00", "%d/%m/%Y", "UTC") == null)
    assert(mdt("04/05/2020", "10:00", "%d/%m/%Y", "UTC") == "2020-05-04T10:00:00+00:00")
    assert(mdt("04/05/2020", "", "%d/%m/%Y", "UTC") == "2020-05-04")
    assert(mdt("04/05/2020", "", "%m/%d/%Y", "UTC") == "2020-04-05")
    assert(mdt("04/05/2020", "", "%Y-%m-%d", "UTC") == null)
    assert(mdt("05/06/2020", "16:00", "%d/%m/%Y", "UTC") == "2020-06-05T16:00:00+00:00")
    assert(mdt("05/06/2020", "16:00", "%d/%m/%Y", "Asia/Tokyo") == "2020-06-05T16:00:00+09:00")
  }

  test("splitDate") {
    def sd(date: Any, option: String, fmt: String = "%Y-%m-%d"): Any =
      run("splitDate", date, List(PLit(option), PLit(2022), PLit(fmt)))
    assert(sd("", "year") == null)
    assert(sd(null, "year") == null)
    assert(sd("2023-07-28", "blah") == null)
    assert(sd("2020-07-28", "year") == 2020L)
    assert(sd("2023-07-28", "month") == 7L)
    assert(sd("2023-07-28", "day") == 28L)
    assert(sd("28/07/2023", "year") == null)
  }

  test("startYear") {
    def sy(dur: Any, date: List[TParam], typ: String, fmt: String = "%Y-%m-%d",
        md: Option[List[TParam]] = None): Any = {
      val base = List(if (date.length == 1) date.head else PList(date),
        PLit(2022), PLit(fmt), PLit(typ))
      run("startYear", dur, base ++ md.map(PList(_)).toList)
    }
    assert(sy("30", List(PLit("")), "years") == null)
    assert(sy("30", List(PLit(null)), "years") == null)
    assert(sy("", List(PLit("2023-07-28")), "years") == null)
    assert(sy(null, List(PLit("2023-07-28")), "years") == null)
    assert(sy("30", List(PLit("2023-07-28")), "blah") == null)
    assert(sy("30", List(PLit("2021-05-28")), "years") == 1991L)
    assert(sy("8", List(PLit("2021-06-28")), "months") == 2020L)
    assert(sy("8.5", List(PLit("2021-06-28")), "months") == 2020L)
    assert(sy("20", List(PLit("2021-07-28")), "days") == 2021L)
    assert(sy("30", List(PLit("28/08/2023")), "years") == null)
    assert(sy("20", List(PLit(null), PLit("2021-07-28"), PLit("1990-07-28")), "days") == 2021L)
    assert(sy("20", List(PLit(""), PLit("2021-07-28"), PLit("1990-07-28")), "days") == 2021L)
    assert(sy("20", List(PLit(""), PLit(""), PLit("")), "years") == null)
    // provide_month_day variants
    assert(sy("30", List(PLit("2021")), "years", md = Some(List(PLit("05"), PLit("28")))) == 1991L)
    assert(sy("8", List(PLit("2021")), "months", md = Some(List(PLit("06"), PLit("28")))) == 2020L)
  }

  test("startMonth") {
    def sm(dur: Any, date: List[TParam], typ: String, fmt: String = "%Y-%m-%d",
        md: Option[List[TParam]] = None): Any = {
      val base = List(if (date.length == 1) date.head else PList(date),
        PLit(2022), PLit(fmt), PLit(typ))
      run("startMonth", dur, base ++ md.map(PList(_)).toList)
    }
    assert(sm("30", List(PLit("")), "months") == null)
    assert(sm("30", List(PLit(null)), "months") == null)
    assert(sm("", List(PLit("2023-07-28")), "months") == null)
    assert(sm(null, List(PLit("2023-07-28")), "months") == null)
    assert(sm("30", List(PLit("2023-07-28")), "blah") == null)
    assert(sm("3", List(PLit("2021-05-28")), "months") == 2L)
    assert(sm("8.5", List(PLit("2021-06-28")), "months") == 10L)
    assert(sm("20", List(PLit("2021-07-28")), "days") == 7L)
    assert(sm("30", List(PLit("28/08/2023")), "months") == null)
    assert(sm("20", List(PLit(null), PLit("2021-07-28"), PLit("1990-07-28")), "days") == 7L)
    assert(sm("20", List(PLit(""), PLit("2021-07-28"), PLit("1990-07-28")), "days") == 7L)
    assert(sm("20", List(PLit(""), PLit(""), PLit("")), "months") == null)
    assert(sm("3", List(PLit("2021")), "months", md = Some(List(PLit("05"), PLit("28")))) == 2L)
    assert(sm("8.5", List(PLit("2021")), "months", md = Some(List(PLit("06"), PLit("28")))) == 10L)
  }

  test("correctOldDate") {
    def cod(date: Any, fmt: String): Any =
      run("correctOldDate", date, List(PLit(2022), PLit(fmt)))
    assert(cod("", "%Y-%m-%d") == null)
    assert(cod(null, "%Y-%m-%d") == null)
    assert(cod("01/01/24", "%Y-%m-%d") == null)
    // (the reference's return_datetime=True mode yields Python datetimes —
    // Column forms emit ISO strings only)
    assert(cod("01/01/24", "%d/%m/%y") == "1924-01-01") // ≥ epoch pivots back
    assert(cod("01/01/20", "%d/%m/%y") == "2020-01-01")
    assert(cod("01/01/2030", "%d/%m/%Y") == "2030-01-01")
  }
}

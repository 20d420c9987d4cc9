package graft.adtl

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** apply-function library behaviors (reference: transformations.py tests,
  * tests/test_adtl/test_transformations.py — semantics re-pinned with
  * original fixtures). */
class TransformationsSpec extends SparkSpec {

  private def strDf(cols: Seq[String], rows: Seq[Seq[String]]): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.map(Row(_: _*)), 1), schema)
  }

  private def runOne(spec: String, cols: Seq[String], row: Seq[String]): Row =
    AdtlParser.fromJsonString(spec).parseDataFrame(spark, strDf(cols, Seq(row)))("t").collect()(0)

  private def t(rules: String): String =
    s"""{"adtl": {"name": "s", "description": "d", "tables": {"t": {"kind": "oneToOne"}}},
        "t": $rules}"""

  test("isNotNull / textIfNotNull") {
    val out = runOne(
      t("""{"has_icu": {"field": "icu", "apply": {"function": "isNotNull"}},
           "marker": {"field": "icu", "apply": {"function": "textIfNotNull", "params": ["admitted"]}},
           "no_marker": {"field": "blank", "apply": {"function": "textIfNotNull", "params": ["x"]}}}"""),
      Seq("icu", "blank"), Seq("2022-01-01", ""))
    assert(out.getAs[Boolean]("has_icu") == true)
    assert(out.getAs[String]("marker") == "admitted")
    assert(out.getAs[String]("no_marker") == null)
  }

  test("getFloat: plain, decimal comma, thousands separator, embedded text") {
    val out = runOne(
      t("""{"a": {"field": "a", "apply": {"function": "getFloat"}},
           "b": {"field": "b", "apply": {"function": "getFloat", "params": [","]}},
           "c": {"field": "c", "apply": {"function": "getFloat", "params": [".", ","]}},
           "d": {"field": "d", "apply": {"function": "getFloat"}}}"""),
      Seq("a", "b", "c", "d"),
      Seq("42.5", "1234,56", "1,234.5", "about 7 kg"))
    assert(out.getAs[Double]("a") == 42.5)
    assert(out.getAs[Double]("b") == 1234.56)
    assert(out.getAs[Double]("c") == 1234.5)
    assert(out.getAs[Double]("d") == 7.0)
  }

  test("Percentage multiplies ≤1 by 100") {
    val out = runOne(
      t("""{"p1": {"field": "a", "apply": {"function": "Percentage"}},
           "p2": {"field": "b", "apply": {"function": "Percentage"}}}"""),
      Seq("a", "b"), Seq("0.85", "85"))
    assert(out.getAs[Double]("p1") == 85.0)
    assert(out.getAs[Double]("p2") == 85.0)
  }

  test("durationDays / yearsElapsed with century epoch") {
    val out = runOne(
      t("""{"los": {"field": "admit", "apply": {"function": "durationDays", "params": ["$discharge"]}},
           "age": {"field": "dob", "apply": {"function": "yearsElapsed", "params": ["$visit", 2022]}}}"""),
      Seq("admit", "discharge", "dob", "visit"),
      Seq("2022-01-01", "2022-01-31", "1990-06-15", "2020-06-15"))
    assert(out.getAs[Long]("los") == 30L)
    assert(math.abs(out.getAs[Double]("age") - 30.0) < 0.02)
  }

  test("yearsElapsed applies the epoch century pivot to 2-digit years") {
    val out = runOne(
      t("""{"age": {"field": "dob", "apply": {"function": "yearsElapsed",
            "params": ["$visit", 2022, "%d/%m/%y", "%Y-%m-%d"]}}}"""),
      Seq("dob", "visit"), Seq("15/06/45", "2020-06-15"))
    // %y → 2045, ≥ epoch 2022 → 1945
    assert(math.abs(out.getAs[Double]("age") - 75.0) < 0.05)
  }

  test("startDate / endDate / makeDate") {
    val out = runOne(
      t("""{"sd": {"field": "end", "apply": {"function": "startDate", "params": ["$dur"]}},
           "ed": {"field": "start", "apply": {"function": "endDate", "params": ["$dur"]}},
           "md": {"field": "y", "apply": {"function": "makeDate", "params": ["$m", "$d"]}},
           "bad": {"field": "y", "apply": {"function": "makeDate", "params": ["$m", "$bad_day"]}}}"""),
      Seq("end", "start", "dur", "y", "m", "d", "bad_day"),
      Seq("2022-03-10", "2022-03-01", "9", "1999", "12", "25", "80"))
    assert(out.getAs[String]("sd") == "2022-03-01")
    assert(out.getAs[String]("ed") == "2022-03-10")
    assert(out.getAs[String]("md") == "1999-12-25")
    assert(out.getAs[String]("bad") == null) // day 80 invalid → null
  }

  test("splitDate / startYear / correctOldDate") {
    val out = runOne(
      t("""{"y": {"field": "d", "apply": {"function": "splitDate", "params": ["year", 2022]}},
           "m": {"field": "d", "apply": {"function": "splitDate", "params": ["month", 2022]}},
           "birth_year": {"field": "age", "apply": {"function": "startYear", "params": [["$visit"], 2022]}},
           "fixed": {"field": "old", "apply": {"function": "correctOldDate", "params": [2022, "%d/%m/%y"]}}}"""),
      Seq("d", "age", "visit", "old"),
      Seq("2021-07-04", "33", "2020-05-01", "01/01/30"))
    assert(out.getAs[Long]("y") == 2021L)
    assert(out.getAs[Long]("m") == 7L)
    assert(out.getAs[Long]("birth_year") == 1987L)
    // %y 30 → 2030 ≥ epoch → 1930
    assert(out.getAs[String]("fixed") == "1930-01-01")
  }

  test("wordSubstituteSet: word-boundary regex, sorted dedup; no match → null") {
    val out = AdtlParser.fromJsonString(
      t("""{"symptoms": {"field": "s", "apply": {"function": "wordSubstituteSet",
            "params": [["head ?ache", "Headache"], ["cough", "Cough"]]}}}"""))
      .parseDataFrame(spark, strDf(Seq("s"),
        Seq(Seq("bad head ache and cough and COUGH"), Seq("nothing relevant"), Seq(""))))("t")
      .collect()
    assert(out(0).getAs[scala.collection.Seq[String]]("symptoms").toList == List("Cough", "Headache"))
    assert(out(1).getAs[scala.collection.Seq[String]]("symptoms") == null)
    assert(out(2).getAs[scala.collection.Seq[String]]("symptoms") == null)
  }

  test("unit conversion: static and coded source_unit") {
    val out = runOne(
      t("""{"wt_kg": {"field": "wt", "unit": "kg", "source_unit": "lbs"},
           "wt2_kg": {"field": "wt2", "unit": "kg",
                      "source_unit": {"field": "wt2_unit", "values": {"1": "kg", "2": "lbs"}}}}"""),
      Seq("wt", "wt2", "wt2_unit"), Seq("150", "80", "1"))
    assert(math.abs(out.getAs[Double]("wt_kg") - 68.0388) < 0.001)
    assert(out.getAs[Double]("wt2_kg") == 80.0)
  }

  test("makeDateTime composes tz-aware ISO; empty time → date only") {
    val out = runOne(
      t("""{"dt": {"field": "d", "apply": {"function": "makeDateTime",
            "params": ["$t", "%Y-%m-%d", "Asia/Tokyo"]}},
           "d_only": {"field": "d", "apply": {"function": "makeDateTime",
            "params": ["$empty", "%Y-%m-%d", "Asia/Tokyo"]}}}"""),
      Seq("d", "t", "empty"), Seq("2022-02-20", "10:30", ""))
    assert(out.getAs[String]("dt") == "2022-02-20T10:30:00+09:00")
    assert(out.getAs[String]("d_only") == "2022-02-20")
  }

  test("custom transform registry (F17)") {
    import org.apache.spark.sql.functions._
    val reg = Transformations.newRegistry()
    reg.register("capitalise", (v, _, _) => initcap(v))
    val spec = SpecLoader.parseJson(
      t("""{"name": {"field": "n", "apply": {"function": "capitalise"}}}"""))
    val out = AdtlParser.fromSpec(spec, registry = reg)
      .parseDataFrame(spark, strDf(Seq("n"), Seq(Seq("alice"))))("t").collect()(0)
    assert(out.getAs[String]("name") == "Alice")
  }
}

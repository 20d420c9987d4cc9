package graft.adtl

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** CSV-file-in → CSV-file-out end-to-end runs (S1/S4/S6 sinks, CLI path),
  * enum_list, returnUnmatched, and dictionary inference. */
class EndToEndSpec extends SparkSpec {

  private def write(dir: String, name: String, content: String): String = {
    val p = s"$dir/$name"
    Files.writeString(Paths.get(p), content)
    p
  }

  test("parse CSV file → validated CSV output with sorted headers") {
    val tmp = Files.createTempDirectory("adtle2e").toString
    write(tmp, "data.csv",
      """subjid,sex,dsstdat,hostdat
        |S001,1,2022-01-01,
        |S001,,2022-01-01,2022-01-05
        |S002,2,2022-01-02,2022-01-06
        |""".stripMargin)
    write(tmp, "spec.toml",
      """[adtl]
        |name = "e2e"
        |description = "end to end"
        |
        |[adtl.tables.subject]
        |kind = "groupBy"
        |groupBy = "subject_id"
        |aggregation = "lastNotNull"
        |
        |[subject]
        |subject_id = { field = "subjid" }
        |country_iso3 = "GBR"
        |sex_at_birth = { field = "sex", values = { 1 = "male", 2 = "female" } }
        |enrolment_date = { field = "dsstdat" }
        |admission_date = { field = "hostdat" }
        |""".stripMargin)

    val parser = AdtlParser.fromFile(s"$tmp/spec.toml")
    val tables = parser.parseCsv(spark, s"$tmp/data.csv")
    parser.writeCsv(tables, "subject", s"$tmp/out")
    val outFile = Files.list(Paths.get(s"$tmp/out")).toArray
      .map(_.toString).find(_.endsWith(".csv")).get
    val lines = Files.readAllLines(Paths.get(outFile))
    assert(lines.get(0) ==
      "admission_date,country_iso3,enrolment_date,sex_at_birth,subject_id")
    assert(lines.size == 3)
    val s1 = lines.toArray.map(_.toString).find(_.endsWith("S001")).get
    assert(s1 == "2022-01-05,GBR,2022-01-01,male,S001")
  }

  test("emptyFields sentinel scrubs to empty before parsing") {
    val tmp = Files.createTempDirectory("adtlna").toString
    write(tmp, "data.csv", "sid,v\nA,NA\nB,7\n")
    write(tmp, "spec.json",
      """{"adtl": {"name": "s", "description": "d", "emptyFields": "NA",
         "tables": {"t": {"kind": "oneToOne"}}},
         "t": {"sid": {"field": "sid"}, "v": {"field": "v"}}}""")
    val parser = AdtlParser.fromFile(s"$tmp/spec.json")
    val out = parser.parseCsv(spark, s"$tmp/data.csv")("t")
      .orderBy("sid").collect()
    assert(out(0).getAs[String]("v") == null) // NA → "" → null
    assert(out(1).getAs[String]("v") == "7")
  }

  test("enum_list: bracketed string splits and recodes per element") {
    val tmp = Files.createTempDirectory("adtlenum").toString
    write(tmp, "data.csv", "sid,symptoms\nA,\"[1, 2]\"\nB,[2]\n")
    write(tmp, "spec.json",
      """{"adtl": {"name": "s", "description": "d", "tables": {"t": {"kind": "oneToOne"}}},
         "t": {"sid": {"field": "sid"},
               "symptoms": {"field": "symptoms", "type": "enum_list",
                            "values": {"1": "cough", "2": "fever"}}}}""")
    val out = AdtlParser.fromFile(s"$tmp/spec.json")
      .parseCsv(spark, s"$tmp/data.csv")("t").orderBy("sid").collect()
    assert(out(0).getAs[scala.collection.Seq[String]]("symptoms").toList ==
      List("cough", "fever"))
    assert(out(1).getAs[scala.collection.Seq[String]]("symptoms").toList == List("fever"))
  }

  test("returnUnmatched: unconvertible values pass through instead of nulling") {
    val spec =
      """{"adtl": {"name": "s", "description": "d", "returnUnmatched": true,
          "tables": {"t": {"kind": "oneToOne"}}},
          "t": {
            "smoking": {"field": "smoking", "values": {"1": "yes", "2": "no"}},
            "age": {"field": "age", "apply": {"function": "getFloat"}},
            "weight_kg": {"field": "weight", "unit": "kg", "source_unit": "lbs"},
            "symptoms": {"field": "symptom_text", "apply": {"function": "wordSubstituteSet",
              "params": [["cough", "Cough"]]}},
            "death_date": {"field": "dy", "apply": {"function": "makeDate",
              "params": ["$dm", "$dd"]}}}}"""
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cols = Seq("smoking", "age", "weight", "symptom_text", "dy", "dm", "dd")
    val rows = Seq(
      Row("1", "15", "150", "bad cough", "1990", "2", "11"),
      Row("sometimes", "fifteen", "eight", "just tired", "1990", "2", "80"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(cols.map(c => StructField(c, StringType))))
    val out = AdtlParser.fromJsonString(spec).parseDataFrame(spark, df)("t")
      .orderBy("smoking").collect()
    val clean = out(1) // "yes" sorts after "sometimes"
    assert(clean.getAs[String]("smoking") == "yes")
    assert(clean.getAs[String]("age") == "15.0")
    assert(clean.getAs[String]("weight_kg").startsWith("68.03"))
    assert(clean.getAs[String]("symptoms") == "['Cough']")
    assert(clean.getAs[String]("death_date") == "1990-02-11")
    val dirty = out(0)
    assert(dirty.getAs[String]("smoking") == "sometimes")
    assert(dirty.getAs[String]("age") == "fifteen")
    assert(dirty.getAs[String]("weight_kg") == "eight")
    assert(dirty.getAs[String]("symptoms") == "just tired")
    assert(dirty.getAs[String]("death_date") == "1990") // raw field value
  }

  test("spec validation errors carry reference-style messages") {
    def err(spec: String): String =
      intercept[Spec.SpecValidationError](AdtlParser.fromJsonString(spec)).getMessage
    assert(err("""{"adtl": {"name": "x", "description": "d",
        "tables": {"t": {"kind": "bogus"}}}, "t": {}}""")
      .contains("invalid kind"))
    assert(err("""{"adtl": {"name": "x", "description": "d",
        "tables": {"t": {"kind": "groupBy", "groupBy": "id"}}}, "t": {}}""")
      .contains("aggregation is required for 'groupBy' tables"))
    assert(err("""{"adtl": {"name": "x", "description": "d",
        "tables": {"t": {"kind": "oneToOne"}}}}""")
      .contains("Parser specification missing tables: t"))
  }

  test("missing source column surfaces 'Column not found' at plan compile") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("1")), 1),
      StructType(Seq(StructField("present", StringType))))
    val parser = AdtlParser.fromJsonString(
      """{"adtl": {"name": "x", "description": "d",
          "tables": {"t": {"kind": "oneToOne"}}},
          "t": {"a": {"field": "nope"}}}""")
    val e = intercept[Spec.SpecValidationError](parser.parseDataFrame(spark, df))
    assert(e.getMessage == "Column 'nope' not found.")
  }

  test("CSV sink renders arrays Python-repr style and booleans True/False") {
    val tmp = Files.createTempDirectory("adtlcsvr").toString
    write(tmp, "data.csv", "sid,d1,d2,flag\nA,x1,x2,1\n")
    write(tmp, "spec.json",
      """{"adtl": {"name": "s", "description": "d", "tables": {"t": {"kind": "oneToOne"}}},
         "t": {"sid": {"field": "sid"},
               "items": {"combinedType": "list", "fields": [{"field": "d1"}, {"field": "d2"}]},
               "ok": {"field": "flag", "values": {"1": true, "0": false}}}}""")
    val parser = AdtlParser.fromFile(s"$tmp/spec.json")
    val tables = parser.parseCsv(spark, s"$tmp/data.csv")
    parser.writeCsv(tables, "t", s"$tmp/out")
    val outFile = Files.list(Paths.get(s"$tmp/out")).toArray
      .map(_.toString).find(_.endsWith(".csv")).get
    val lines = Files.readAllLines(Paths.get(outFile))
    assert(lines.get(0) == "items,ok,sid")
    // Python csv.DictWriter would emit "['x1', 'x2']",True,A
    assert(lines.get(1) == "\"['x1', 'x2']\",True,A")
  }

  test("canonicalNumbers renders numeric strings like the reference auto-cast") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("007", "1.50"), Row("42", "abc"), Row("-03", "2.0")), 1),
      StructType(Seq(StructField("a", StringType), StructField("b", StringType))))
    val spec =
      """{"adtl": {"name": "s", "description": "d", "tables": {"t": {"kind": "oneToOne"}}},
         "t": {"a": {"field": "a"}, "b": {"field": "b"}}}"""
    val out = AdtlParser.fromJsonString(spec).withCanonicalNumbers()
      .parseDataFrame(spark, df)("t").orderBy("a").collect()
      .map(r => (r.getString(0), r.getString(1))).toList
    assert(out == List(("-3", "2.0"), ("42", "abc"), ("7", "1.5")))
  }

  test("checkSpecFields diffs spec fields against data columns") {
    val spec =
      """{"adtl": {"name": "s", "description": "d", "tables": {"t": {"kind": "oneToOne"}}},
          "t": {"a": {"field": "col_a"}, "b": {"field": "col_b"}}}"""
    val parser = AdtlParser.fromJsonString(spec)
    val (unmapped, absent) = parser.checkSpecFields(Seq("col_a", "col_c"))
    assert(unmapped == Set("col_c"))
    assert(absent == Set("col_b"))
  }

  test("DictWriter infers types and common values with privacy guard") {
    import graft.adtl.autoparser.DictWriter
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val dict = DictWriter.createDict(spark, docs).map(f => f.name -> f).toMap
    assert(dict("doc_id").fieldType == "number")
    assert(dict("n_chars").fieldType == "number")
    assert(dict("lang").fieldType == "string")
    assert(dict("lang").commonValues.nonEmpty) // few distinct codes → listed
    assert(dict("text").commonValues.isEmpty) // free text → suppressed
  }
}

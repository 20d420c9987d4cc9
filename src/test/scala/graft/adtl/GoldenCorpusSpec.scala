package graft.adtl

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden-corpus parity: runs the REFERENCE's own parser fixtures
  * (/root/reference/tests/test_adtl/parsers + sources + schemas, copied to
  * src/test/resources/golden) through AdtlParser and compares against the
  * reference's committed snapshot outputs (__snapshots__ .ambr files) and its
  * test expectations (tests/test_adtl/test_parser.py,
  * test_one_to_many_parser.py). This is the drop-in-parity proof: same spec
  * files, same source data, same output bytes.
  *
  * CSV comparisons are header-byte-exact with data rows compared as a
  * multiset (Spark does not define output row order; the reference emits
  * dict-insertion order).
  */
class GoldenCorpusSpec extends SparkSpec {

  private val golden = "src/test/resources/golden"

  // ---- harness ----------------------------------------------------------

  /** Extract a named snapshot's triple-quoted block from an .ambr file. */
  private def snapshot(file: String, name: String): List[String] = {
    val lines = Files.readAllLines(Paths.get(s"$golden/snapshots/$file")).asScala.toList
    val start = lines.indexWhere(_ == s"# name: $name")
    require(start >= 0, s"snapshot '$name' not found in $file")
    require(lines(start + 1).trim == "'''", s"snapshot '$name' is not a text block")
    lines.drop(start + 2).takeWhile(_.trim != "'''")
      .map(l => if (l.startsWith("  ")) l.substring(2) else l)
      .reverse.dropWhile(_.isEmpty).reverse // trailing newline
  }

  /** Python csv.writer minimal quoting. */
  private def pyQuote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** The engine's write_csv equivalent as lines (header + rows). */
  private def csvLines(parser: AdtlParser, df: DataFrame): List[String] = {
    val rendered = parser.renderForCsv(df)
    val header = rendered.columns.map(pyQuote).mkString(",")
    val rows = rendered.collect().toList.map { r =>
      rendered.columns.indices
        .map(i => if (r.isNullAt(i)) "" else pyQuote(r.getString(i))).mkString(",")
    }
    header :: rows
  }

  private def assertCsv(actual: List[String], expected: List[String]): Unit = {
    assert(actual.head == expected.head, "CSV header mismatch")
    assert(actual.tail.sorted == expected.tail.sorted, "CSV rows mismatch")
  }

  /** All-string source DataFrame (CSV DictReader semantics, like the
    * reference's parse_rows on stringified values). */
  private def srcDf(cols: String*)(rows: Seq[String]*): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    spark.createDataFrame(rows.map(r => Row(r: _*)).asJava, schema)
  }

  /** Collect rows as reference-style dicts: null keys dropped, values
    * rendered as Python str() (True/False, floats keep .0, arrays sorted
    * for order-free set/list comparison). */
  private def collectRows(df: DataFrame): List[Map[String, String]] =
    df.collect().toList.map { r =>
      df.columns.zipWithIndex.flatMap { case (c, i) =>
        if (r.isNullAt(i)) None
        else Some(c -> (r.get(i) match {
          case s: scala.collection.Seq[_] =>
            s.map(String.valueOf).sorted.mkString("[", ", ", "]")
          case b: Boolean => if (b) "True" else "False"
          case d: Double =>
            if (d == math.floor(d) && !d.isInfinite) s"${d.toLong}.0" else d.toString
          case v => String.valueOf(v)
        }))
      }.toMap
    }

  private def assertRows(actual: List[Map[String, String]],
      expected: List[Map[String, String]]): Unit = {
    val key = (m: Map[String, String]) => m.toSeq.sorted.mkString("|")
    assert(actual.sortBy(key) == expected.sortBy(key),
      s"rows mismatch:\n  actual:   ${actual.sortBy(key)}\n  expected: ${expected.sortBy(key)}")
  }

  private def parserFor(name: String): AdtlParser =
    AdtlParser.fromFile(s"$golden/parsers/$name")

  // ---- CSV snapshot tests (test_parser.py ↔ test_parser.ambr) -----------

  test("golden: default date format (epoch.json + epoch.csv)") {
    val p = parserFor("epoch.json")
    val tables = p.parseCsv(spark, s"$golden/sources/epoch.csv")
    assertCsv(csvLines(p, tables("table")),
      snapshot("test_parser.ambr", "test_default_date_format"))
  }

  test("golden: skipFieldPattern with fields present (skip_field.json)") {
    val p = parserFor("skip_field.json")
    val tables = p.parseCsv(spark, s"$golden/sources/skip_field_present.csv")
    assertCsv(csvLines(p, tables("table")),
      snapshot("test_parser.ambr", "test_skip_field_pattern_present"))
  }

  test("golden: skipFieldPattern with fields absent (skip_field.json)") {
    val p = parserFor("skip_field.json")
    val tables = p.parseCsv(spark, s"$golden/sources/skip_field_absent.csv")
    assertCsv(csvLines(p, tables("table")),
      snapshot("test_parser.ambr", "test_skip_field_pattern_absent"))
  }

  test("golden: groupBy parse + write buffer (groupBy.json)") {
    val p = parserFor("groupBy.json")
    val src = srcDf("sex", "subjid", "dsstdat", "hostdat")(
      Seq("1", "S007", "2020-05-06", "2020-06-08"),
      Seq("2", "S001", "2022-01-11", "2020-06-08"))
    val tables = p.parseDataFrame(spark, src)
    assertCsv(csvLines(p, tables("subject")),
      snapshot("test_parser.ambr", "test_parse_write_buffer"))
  }

  test("golden: groupBy validation annotations (groupBy-with-schema.json)") {
    val p = parserFor("groupBy-with-schema.json")
    val src = srcDf("sex", "subjid", "dsstdat", "hostdat", "ethnic")(
      Seq("1", "S007", "2020-05-06", "2020-06-08", "1"),
      Seq("", "S007", "", "", ""),
      Seq("5", "S001", "2022-01-11", "8/6/2022", "2"),
      Seq("1", "S009", "2020-05-06", "8/6/2020", "3"))
    val tables = p.parseDataFrame(spark, src)
    assertCsv(csvLines(p, tables("subject")),
      snapshot("test_parser.ambr", "test_validation"))
  }

  test("golden: multi-id groupBy via firstNonNull id (groupBy-multi-id.json)") {
    val p = parserFor("groupBy-multi-id.json")
    val src = srcDf("sex", "subjid", "othid", "dsstdat", "hostdat")(
      Seq("1", "", "P007", "2020-05-06", "2020-06-08"),
      Seq("2", "S001", "P008", "2022-01-11", "2020-06-08"))
    val tables = p.parseDataFrame(spark, src)
    assertCsv(csvLines(p, tables("subject")),
      snapshot("test_parser.ambr", "test_multi_id_groupby"))
  }

  test("golden: returnUnmatched passes raw values through (return-unmapped.toml)") {
    val p = parserFor("return-unmapped.toml")
    val tables = p.parseCsv(spark, s"$golden/sources/return-unmapped.csv")
    assertCsv(csvLines(p, tables("subject")),
      snapshot("test_parser.ambr", "test_return_unmapped"))
  }

  test("golden: web schema fetched (epoch-web-schema.json + stub server)") {
    // test_adtl_cli.py::test_parse_web_schema — schema served over HTTP
    val schemaBody = Files.readString(
      Paths.get(s"$golden/schemas/epoch-data.schema.json"))
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/epoch-data.schema.json",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val b = schemaBody.getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/epoch-data.schema.json"
      val spec = Files.readString(Paths.get(s"$golden/parsers/epoch-web-schema.json"))
        .replace("http://example.com/schemas/epoch-data.schema.json", url)
      val p = AdtlParser.fromSpec(SpecLoader.parseJson(spec))
      val tables = p.parseCsv(spark, s"$golden/sources/epoch.csv")
      assertCsv(csvLines(p, tables("table")),
        snapshot("test_adtl_cli.ambr", "test_parse_web_schema"))
    } finally server.stop(0)
  }

  test("golden: unreachable web schema skips validation AND date conversion") {
    // test_adtl_cli.py::test_parse_web_schema_missing — no schema means no
    // date fields, so dates pass through raw and no adtl_valid column
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/epoch-data.schema.json",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.sendResponseHeaders(404, -1)
        ex.close()
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/epoch-data.schema.json"
      val spec = Files.readString(Paths.get(s"$golden/parsers/epoch-web-schema.json"))
        .replace("http://example.com/schemas/epoch-data.schema.json", url)
      val p = AdtlParser.fromSpec(SpecLoader.parseJson(spec))
      val tables = p.parseCsv(spark, s"$golden/sources/epoch.csv")
      assertCsv(csvLines(p, tables("table")),
        snapshot("test_adtl_cli.ambr", "test_parse_web_schema_missing"))
    } finally server.stop(0)
  }

  // ---- row-level tests (test_parser.py expectations) --------------------

  test("golden: constant table (constant.json)") {
    val p = parserFor("constant.json")
    val tables = p.parseDataFrame(spark, srcDf("x")(Seq("1")))
    assertRows(collectRows(tables("metadata")), List(
      Map("dataset" -> "constant", "version" -> "20220505.1", "format" -> "csv")))
  }

  test("golden: emptyFields sentinel (emptyFields.json + emptyFields.csv)") {
    val p = parserFor("emptyFields.json")
    val tables = p.parseCsv(spark, s"$golden/sources/emptyFields.csv")
    assertRows(collectRows(tables("observation")), List(
      Map("is_present" -> "True", "name" -> "headache")))
  }

  // ---- one-to-many (test_one_to_many_parser.py) -------------------------

  private val oneManyExpected = List(
    Map("date" -> "2022-02-05", "name" -> "headache", "is_present" -> "True"),
    Map("date" -> "2022-02-05", "name" -> "cough", "is_present" -> "True"))

  test("golden: oneToMany fan-out (oneToMany.json, rows + csv)") {
    val p = parserFor("oneToMany.json")
    val src = srcDf("dt", "headache_cmyn", "cough_cmyn", "dyspnea_cmyn")(
      Seq("2022-02-05", "1", "1", "0"))
    assertRows(collectRows(p.parseDataFrame(spark, src)("observation")), oneManyExpected)
    val fromCsv = p.parseCsv(spark, s"$golden/sources/oneToMany.csv")
    assertRows(collectRows(fromCsv("observation")), oneManyExpected)
  }

  test("golden: oneToMany common mappings (oneToMany-commonMappings.json)") {
    val p = parserFor("oneToMany-commonMappings.json")
    val src = srcDf("dt", "headache_cmyn", "cough_cmyn", "dyspnea_cmyn")(
      Seq("2022-02-05", "1", "1", "0"))
    assertRows(collectRows(p.parseDataFrame(spark, src)("observation")),
      oneManyExpected.map(_ + ("dataset_id" -> "ONE_TO_MANY")))
  }

  test("golden: oneToMany default-if derivation (oneToMany-missingIf.toml)") {
    val p = parserFor("oneToMany-missingIf.toml")
    val full = p.parseCsv(spark, s"$golden/sources/oneToManyIf.csv")
    assertRows(collectRows(full("observation")), List(
      Map("date" -> "2022-02-05", "name" -> "headache", "phase" -> "admission",
        "is_present" -> "False", "adtl_valid" -> "True"),
      Map("date" -> "2022-02-05", "name" -> "oxygen_saturation", "phase" -> "admission",
        "value" -> "87.0", "adtl_valid" -> "True"),
      Map("date" -> "2022-02-05", "name" -> "cough", "phase" -> "admission",
        "is_present" -> "True", "adtl_valid" -> "True"),
      Map("date" -> "2022-02-05", "name" -> "pao2_sample_type", "phase" -> "study",
        "text" -> "Capillary", "adtl_valid" -> "True"),
      Map("date" -> "2022-02-06", "name" -> "history_of_fever", "phase" -> "followup",
        "is_present" -> "True", "adtl_valid" -> "True"),
      Map("date" -> "2022-02-07", "name" -> "history_of_fever", "phase" -> "followup",
        "is_present" -> "False", "adtl_valid" -> "True"),
      Map("date" -> "2022-02-05", "name" -> "fatigue_malaise", "phase" -> "followup",
        "is_present" -> "True", "adtl_valid" -> "True"),
      Map("date" -> "2022-02-05", "name" -> "severe_dehydration", "phase" -> "admission",
        "is_present" -> "False", "adtl_valid" -> "True")))

    val missing = p.parseCsv(spark, s"$golden/sources/oneToManyIf-missing.csv")
    assertRows(collectRows(missing("observation")), List(
      Map("date" -> "2022-02-05", "name" -> "cough", "phase" -> "admission",
        "is_present" -> "True", "adtl_valid" -> "True"),
      Map("date" -> "2022-02-07", "name" -> "history_of_fever", "phase" -> "followup",
        "is_present" -> "False", "adtl_valid" -> "True")))
  }

  test("golden: apply inside oneToMany entries (apply-observations.toml)") {
    val p = parserFor("apply-observations.toml")
    val src = srcDf("dsstdat", "flw_headache", "flw_cough", "dyspnea_cmyn")(
      Seq("2023-02-01", "1", "1", "0"))
    assertRows(collectRows(p.parseDataFrame(spark, src)("observation")), List(
      Map("date" -> "2023-02-01", "start_date" -> "2023-01-22", "phase" -> "followup",
        "duration_type" -> "event", "name" -> "headache", "is_present" -> "True"),
      Map("date" -> "2023-02-01", "start_date" -> "2023-01-25", "phase" -> "followup",
        "duration_type" -> "event", "name" -> "cough", "is_present" -> "True")))
  }

  // ---- apply + groupBy (apply.toml) -------------------------------------

  test("golden: apply with values present (apply.toml)") {
    val p = parserFor("apply.toml")
    val src = srcDf("subjid", "brthdtc", "dsstdat", "age", "ageu", "icu_hostdat")(
      Seq("S007", "1996-02-24", "2023-02-24", "22", "1", "1"))
    val out = p.parseDataFrame(spark, src)("subject").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("subject_id") == "S007")
    assert(math.abs(r.getAs[Double]("age") - 27.0) < 0.001) // yearsElapsed
    assert(r.getAs[Boolean]("icu_admitted"))
    assert(r.getAs[Long]("dob_year") == 1974L)
  }

  test("golden: apply with values absent (apply.toml)") {
    val p = parserFor("apply.toml")
    val src = srcDf("subjid", "brthdtc", "dsstdat", "age", "ageu", "icu_hostdat")(
      Seq("S007", "", "2023-02-24", "22", "1", ""))
    val out = p.parseDataFrame(spark, src)("subject").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("subject_id") == "S007")
    // Reference's own test feeds ageu as a Python int, which MISSES the
    // string-keyed values map and short-circuits to float(age)=22.0
    // (get_value.py:203-210). With CSV string semantics — the reference's
    // file-parsing path and this engine's data model — "1" maps to
    // "months" and 22 months converts to years in both engines.
    assert(math.abs(r.getAs[Double]("age") - 22.0 / 12.0) < 1e-9)
    assert(!r.getAs[Boolean]("icu_admitted"))
    assert(r.getAs[Long]("dob_year") == 2001L)
  }

  test("golden: custom transform registry (custom_transformations.toml)") {
    val reg = Transformations.newRegistry()
    reg.register("capitalise", (v, _, _) =>
      org.apache.spark.sql.functions.upper(v))
    val p = AdtlParser.fromFile(s"$golden/parsers/custom_transformations.toml",
      registry = reg)
    val src = srcDf("subjid", "brthdtc", "dsstdat", "age", "ageu", "icu_hostdat", "type")(
      Seq("S007", "1996-02-24", "2023-02-24", "22", "1", "1", "fish"))
    val r = p.parseDataFrame(spark, src)("subject").collect()(0)
    assert(r.getAs[String]("animal_type") == "FISH")
    assert(r.getAs[Long]("dob_year") == 1974L)
  }

  // ---- groupBy overwrite semantics (stop-overwriting.toml) --------------

  test("golden: applyCombinedType groupBy (stop-overwriting.toml)") {
    val p = parserFor("stop-overwriting.toml")
    val tables = p.parseCsv(spark, s"$golden/sources/stop-overwriting.csv")
    assertRows(collectRows(tables("visit")), List(
      Map("subject_id" -> "1", "earliest_admission" -> "2023-11-19",
        "start_date" -> "2023-11-20",
        "treatment_antiviral_type" -> "[Interferon, Ribavirin]"),
      Map("subject_id" -> "2", "start_date" -> "2022-11-23",
        "icu_admission_date" -> "[2020-11-25, 2020-11-30]",
        "treatment_antiviral_type" -> "[Lopinavir]"),
      Map("subject_id" -> "3", "start_date" -> "2020-02-20",
        "treatment_antiviral_type" -> "[Interferon, Lopinavir, Ribavirin]")))
  }

  test("golden: lastNotNull aggregation ignores combinedType (strict overwrite)") {
    // the reference test mutates aggregation to a non-applyCombinedType
    // value post-construction; any other aggregation makes every attribute
    // take the last non-empty per-row value (parser.py:568-571)
    val toml = Files.readString(Paths.get(s"$golden/parsers/stop-overwriting.toml"))
      .replace("applyCombinedType", "lastNotNull")
    val p = AdtlParser.fromSpec(TomlParser.parse(toml))
    val tables = p.parseCsv(spark, s"$golden/sources/stop-overwriting.csv")
    assertRows(collectRows(tables("visit")), List(
      Map("subject_id" -> "1", "earliest_admission" -> "2023-11-19",
        "start_date" -> "2023-11-19",
        "treatment_antiviral_type" -> "[Ribavirin]"),
      Map("subject_id" -> "2", "start_date" -> "2020-11-23",
        "icu_admission_date" -> "[2020-11-30]",
        "treatment_antiviral_type" -> "[Lopinavir]"),
      Map("subject_id" -> "3", "start_date" -> "2020-02-20",
        "treatment_antiviral_type" -> "[Ribavirin]")))
  }

  test("golden: overwrite-count diagnostics (parser.py:596-615 scale analogue)") {
    // applyCombinedType mode: every attribute in this fixture has a
    // combinedType — nothing takes the overwrite path, nothing to count
    val p = parserFor("stop-overwriting.toml")
    val src = p.readCsv(spark, s"$golden/sources/stop-overwriting.csv")
    assert(p.overwriteCounts(spark, src) == Map("visit" -> Map.empty))

    // strict mode via the programmatic override (the reference test's
    // `prsr.tables["visit"]["aggregation"] = "lastNotNullStrict"`,
    // test_parser.py:280-283): every attribute overwrites; the counts are
    // exactly the groups the reference's verbose warnings fire for
    val strict = parserFor("stop-overwriting.toml")
      .withAggregation("visit", "lastNotNullStrict")
    assert(strict.overwriteCounts(spark, src) == Map("visit" -> Map(
      "earliest_admission" -> 1L, "start_date" -> 2L,
      "icu_admission_date" -> 1L, "treatment_antiviral_type" -> 2L)))

    // and the override changes parse output the same way the TOML rewrite
    // does: the strict rows from test_overwriting_with_strict_groupby
    assertRows(collectRows(
      strict.parseCsv(spark, s"$golden/sources/stop-overwriting.csv")("visit")), List(
      Map("subject_id" -> "1", "earliest_admission" -> "2023-11-19",
        "start_date" -> "2023-11-19",
        "treatment_antiviral_type" -> "[Ribavirin]"),
      Map("subject_id" -> "2", "start_date" -> "2020-11-23",
        "icu_admission_date" -> "[2020-11-30]",
        "treatment_antiviral_type" -> "[Lopinavir]"),
      Map("subject_id" -> "3", "start_date" -> "2020-02-20",
        "treatment_antiviral_type" -> "[Ribavirin]")))

    // CLI surface (`adtlspark parse -v`): one warning line per dirty attr
    val buf = new java.io.ByteArrayOutputStream()
    Console.withErr(new java.io.PrintStream(buf, true, "UTF-8")) {
      Main.printOverwriteWarnings(strict.overwriteCounts(spark, src))
    }
    val lines = buf.toString("UTF-8").split("\n").toList.filter(_.nonEmpty)
    assert(lines.length == 4)
    assert(lines.contains("Warning: Multiple rows of data found for " +
      "start_date in table 'visit' without a combinedType listed. " +
      "Data being overwritten in 2 group(s)."))
  }

  test("golden: post-parse overwriteCounts reuses the parse input, no re-scan") {
    // before any parse: the no-arg form has nothing to reuse
    intercept[IllegalStateException](
      parserFor("stop-overwriting.toml").overwriteCounts())

    val strict = parserFor("stop-overwriting.toml")
      .withAggregation("visit", "lastNotNullStrict")
      .withCachedInput()
    strict.parseCsv(spark, s"$golden/sources/stop-overwriting.csv")
    // same counts as the standalone two-arg form...
    val src = strict.readCsv(spark, s"$golden/sources/stop-overwriting.csv")
    assert(strict.overwriteCounts() == strict.overwriteCounts(spark, src))
    // ...and the reused input is the parse's MATERIALIZED frame: the plan
    // reads the in-memory cache, not the CSV source, so `-v` diagnostics
    // never cost a second source scan (the CLI enables withCachedInput)
    val reused = strict.lastParseInput.get._1
    assert(reused.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }.nonEmpty)
  }

  test("golden: read_table error for wrong table names") {
    val p = parserFor("epoch.json")
    val tables = p.parseCsv(spark, s"$golden/sources/epoch.csv")
    val e = intercept[IllegalArgumentException](p.readTable(tables, "wrong-name"))
    assert(e.getMessage.contains("Invalid table name"))
  }

  test("golden: show_report markdown format (test_show_report)") {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      Main.printReport(Map("table" -> ((8L, 10L, Map(
        "data must be valid exactly by one definition (0 matches found)" -> 1L,
        "data must contain ['epoch'] properties" -> 1L)))))
    }
    val actual = buf.toString("UTF-8").split("\n", -1).toList
      .reverse.dropWhile(_.isEmpty).reverse
    val expected = snapshot("test_parser.ambr", "test_show_report")
    // tie-broken error ordering is map-order dependent — compare the exact
    // header/table lines, and the error bullets as a set
    assert(actual.take(5) == expected.take(5))
    assert(actual.drop(5).toSet == expected.drop(5).toSet)
  }

  // ---- defs / include-def expansion (test_spec_refs_and_defs.py) --------

  test("golden: defs expand to the same parse as inline rules (groupBy-defs)") {
    val src = srcDf("sex", "subjid", "dsstdat", "hostdat")(
      Seq("1", "S007", "2020-05-06", "2020-06-08"),
      Seq("2", "S001", "2022-01-11", "2020-06-08"))
    val plain = parserFor("groupBy.json")
    val withDefs = parserFor("groupBy-defs.json")
    assertCsv(csvLines(withDefs, withDefs.parseDataFrame(spark, src)("subject")),
      csvLines(plain, plain.parseDataFrame(spark, src)("subject")))
  }

  test("golden: include-def files splice into defs (groupBy-defs-include)") {
    val src = srcDf("sex", "subjid", "dsstdat", "hostdat")(
      Seq("1", "S007", "2020-05-06", "2020-06-08"),
      Seq("2", "S001", "2022-01-11", "2020-06-08"))
    val inline = parserFor("groupBy-defs.toml")
    val included = parserFor("groupBy-defs-include.toml")
    assertCsv(csvLines(included, included.parseDataFrame(spark, src)("subject")),
      csvLines(inline, inline.parseDataFrame(spark, src)("subject")))
  }

  test("golden: external defs require include_defs (groupBy-external-defs)") {
    intercept[Spec.SpecValidationError] {
      parserFor("groupBy-external-defs.toml")
    }
    val p = AdtlParser.fromFile(s"$golden/parsers/groupBy-external-defs.toml",
      includeDefs = List(s"$golden/parsers/include-def.toml"))
    val src = srcDf("sex", "subjid", "dsstdat", "hostdat")(
      Seq("1", "S007", "2020-05-06", "2020-06-08"))
    val r = collectRows(p.parseDataFrame(spark, src)("subject"))
    assert(r.head("sex_at_birth") == "male")
  }

  // ---- generate: uuid5 (onetomany_generate.toml ↔ .ambr) ----------------

  test("golden: uuid5 generation matches reference byte-for-byte") {
    val p = parserFor("onetomany_generate.toml")
    val src = srcDf("subjid", "form", "repeat_instance", "med_type",
      "antiviral_type", "med_route", "med_dose", "med_unit", "med_start_date")(
      Seq("001", "medication", "1", "1", "2", "1", "500", "mg", "2023-01-15"),
      Seq("001", "medication", "2", "1", "4", "1", "700", "mg", "2023-01-16"),
      Seq("001", "medication", "3", "1", "3", "2", "0.1", "l/min", "2023-01-17"))
    val rows = collectRows(p.parseDataFrame(spark, src)("long"))
    // The reference's own test feeds med_dose as Python float 0.1, and its
    // `if = { med_dose != 99 }` casts with int(0.1) == 0 → True, emitting a
    // 9th row (medi_dose 0.1). Under CSV string semantics — the reference's
    // file path and this engine's model — int("0.1") raises → False
    // (get_value.py:305-312), so both engines emit 8 rows.
    assert(rows.length == 8)
    assert(rows.map(_("event_id")).toSet == Set(
      "984609e3-d381-5ef9-9763-ea8e54f3f841",
      "75219ae2-4b81-5268-997d-fbad16fff71c",
      "8eb85e27-8414-52eb-82d3-f8b8e4bbfd93"))
    assertRows(rows, List(
      Map("date" -> "2023-01-15", "event_id" -> "984609e3-d381-5ef9-9763-ea8e54f3f841",
        "name" -> "medi_antiviralagent", "value" -> "drug_2"),
      Map("date" -> "2023-01-15", "event_id" -> "984609e3-d381-5ef9-9763-ea8e54f3f841",
        "name" -> "medi_route", "value" -> "oral"),
      Map("date" -> "2023-01-15", "event_id" -> "984609e3-d381-5ef9-9763-ea8e54f3f841",
        "name" -> "medi_dose", "unit" -> "mg", "value" -> "500"),
      Map("date" -> "2023-01-16", "event_id" -> "75219ae2-4b81-5268-997d-fbad16fff71c",
        "name" -> "medi_antiviralagent", "value" -> "drug_4"),
      Map("date" -> "2023-01-16", "event_id" -> "75219ae2-4b81-5268-997d-fbad16fff71c",
        "name" -> "medi_route", "value" -> "oral"),
      Map("date" -> "2023-01-16", "event_id" -> "75219ae2-4b81-5268-997d-fbad16fff71c",
        "name" -> "medi_dose", "unit" -> "mg", "value" -> "700"),
      Map("date" -> "2023-01-17", "event_id" -> "8eb85e27-8414-52eb-82d3-f8b8e4bbfd93",
        "name" -> "medi_antiviralagent", "value" -> "drug_3"),
      Map("date" -> "2023-01-17", "event_id" -> "8eb85e27-8414-52eb-82d3-f8b8e4bbfd93",
        "name" -> "medi_route", "value" -> "IV")))
  }

  // ---- long-table subschema validation (long-oneof) ---------------------

  test("golden: per-discriminator subschema validation (long-oneof-parser.toml)") {
    val p = parserFor("long-oneof-parser.toml")
    val tables = p.parseCsv(spark, s"$golden/sources/long-oneof.csv")
    assertRows(collectRows(tables("long")), List(
      Map("adtl_valid" -> "True", "attribute" -> "lesion_ml", "phase" -> "presentation",
        "subjid" -> "1", "value" -> "2-5"),
      Map("adtl_valid" -> "True", "attribute" -> "comor_dementia", "phase" -> "presentation",
        "subjid" -> "1", "value" -> "Yes"),
      Map("adtl_valid" -> "True", "attribute" -> "vital_rass", "phase" -> "presentation",
        "subjid" -> "1", "value_num" -> "1.0"),
      Map("adtl_valid" -> "False", "attribute" -> "lesion_ml", "phase" -> "presentation",
        "subjid" -> "2", "value" -> "five",
        "adtl_error" -> "data.value must be one of ['None', '1', '2-5', '6-9', '10-24', '25-49', '50-99', '100-250', '251-1000', '>1000']"),
      Map("adtl_valid" -> "True", "attribute" -> "comor_dementia", "phase" -> "presentation",
        "subjid" -> "2", "value" -> "Yes"),
      Map("adtl_valid" -> "True", "attribute" -> "vital_rass", "phase" -> "presentation",
        "subjid" -> "2", "value_num" -> "2.0"),
      Map("adtl_valid" -> "True", "attribute" -> "lesion_ml", "phase" -> "presentation",
        "subjid" -> "3", "value" -> "2-5"),
      Map("adtl_valid" -> "True", "attribute" -> "comor_dementia", "phase" -> "presentation",
        "subjid" -> "3", "value" -> "Yes"),
      Map("adtl_valid" -> "False", "attribute" -> "comor_asthma", "phase" -> "presentation",
        "subjid" -> "3", "value_num" -> "False",
        "adtl_error" -> "data must contain ['subjid', 'phase', 'attribute', 'value'] properties"),
      Map("adtl_valid" -> "True", "attribute" -> "vital_rass", "phase" -> "presentation",
        "subjid" -> "3", "value_num" -> "3.0")))
  }
}

package graft.adtl

import org.scalatest.funsuite.AnyFunSuite

class TomlParserSpec extends AnyFunSuite {

  test("tables, arrays of tables, inline tables, types") {
    val doc = TomlParser.parse(
      """
        |[adtl]
        |name = "test"          # comment
        |description = 'desc'
        |returnUnmatched = true
        |count = 42
        |ratio = 3.5
        |
        |[adtl.tables.subject]
        |kind = "groupBy"
        |groupBy = "subject_id"
        |aggregation = "lastNotNull"
        |
        |[adtl.defs."Y/N/NK"]
        |values = { 1 = "yes", 2 = "no", 3 = "unknown" }
        |
        |[subject]
        |country_iso3 = "GBR"
        |sex = { field = "sex", values = { 1 = "male", 2 = "female" } }
        |
        |[[observation]]
        |name = "cough"
        |phase = "admission"
        |
        |[[observation]]
        |name = "fever"
        |list = ["a", "b",
        |  "c"]
        |""".stripMargin)

    val adtl = doc("adtl").asInstanceOf[Map[String, Any]]
    assert(adtl("name") == "test")
    assert(adtl("description") == "desc")
    assert(adtl("returnUnmatched") == true)
    assert(adtl("count") == 42L)
    assert(adtl("ratio") == 3.5)
    val tables = adtl("tables").asInstanceOf[Map[String, Any]]
    assert(tables("subject").asInstanceOf[Map[String, Any]]("kind") == "groupBy")
    val defs = adtl("defs").asInstanceOf[Map[String, Any]]
    val ynk = defs("Y/N/NK").asInstanceOf[Map[String, Any]]("values").asInstanceOf[Map[String, Any]]
    assert(ynk("1") == "yes")
    val subject = doc("subject").asInstanceOf[Map[String, Any]]
    assert(subject("country_iso3") == "GBR")
    val sex = subject("sex").asInstanceOf[Map[String, Any]]
    assert(sex("field") == "field" || sex("field") == "sex")
    val obs = doc("observation").asInstanceOf[List[Map[String, Any]]]
    assert(obs.length == 2)
    assert(obs.head("name") == "cough")
    assert(obs(1)("list") == List("a", "b", "c"))
  }

  test("integer keys in inline tables stay strings") {
    val doc = TomlParser.parse("""v = { 1 = true, 0 = false }""")
    val v = doc("v").asInstanceOf[Map[String, Any]]
    assert(v("1") == true && v("0") == false)
  }

  test("multiline strings and escapes") {
    val doc = TomlParser.parse(
      "a = \"line\\nbreak\"\nb = '''raw\nstring'''\nc = \"\"\"tri\nple\"\"\"")
    assert(doc("a") == "line\nbreak")
    assert(doc("b") == "raw\nstring")
    assert(doc("c") == "tri\nple")
  }

  test("dotted keys create nested tables") {
    val doc = TomlParser.parse("[t]\na.b = 1\na.c = \"x\"")
    val t = doc("t").asInstanceOf[Map[String, Any]]
    val a = t("a").asInstanceOf[Map[String, Any]]
    assert(a("b") == 1L && a("c") == "x")
  }
}

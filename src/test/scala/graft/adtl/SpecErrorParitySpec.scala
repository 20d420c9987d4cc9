package graft.adtl

import org.scalatest.funsuite.AnyFunSuite

/** The reference's eight parametrized invalid-spec cases
  * (tests/test_adtl/test_spec_refs_and_defs.py:114-212): the thrown
  * message must contain the reference's error text (their test matches
  * substrings too). */
class SpecErrorParitySpec extends AnyFunSuite {

  private def err(spec: Spec.Raw): String =
    intercept[Spec.SpecValidationError](AdtlParser.fromSpec(spec)).getMessage

  private def header(tables: (String, Map[String, Any])*): Spec.Raw =
    Map("adtl" -> Map(
      "name" -> "invalid_spec", "description" -> "d",
      "tables" -> tables.toMap))

  test("missing-kind") {
    val golden = "src/test/resources/golden/parsers/groupBy-missing-kind.json"
    val msg = intercept[Spec.SpecValidationError](
      AdtlParser.fromFile(golden)).getMessage
    assert(msg.contains("adtl.tables.subject.kind\n  Field required"))
  }

  test("missing-table") {
    val golden = "src/test/resources/golden/parsers/groupBy-missing-table.json"
    val msg = intercept[Spec.SpecValidationError](
      AdtlParser.fromFile(golden)).getMessage
    assert(msg.contains("Parser specification missing tables: subject"))
  }

  test("incorrect-aggregation") {
    val spec = header("subject" -> Map(
      "kind" -> "groupBy", "groupBy" -> "subject_id", "aggregation" -> "foobar"))
    assert(err(spec).contains(
      "adtl.tables.subject.aggregation\n  Input should be 'lastNotNull' or 'applyCombinedType'"))
  }

  test("missing-discriminator") {
    val spec = header("observation" -> Map("kind" -> "oneToMany"))
    assert(err(spec).contains("'discriminator' is required for 'oneToMany' tables"))
  }

  test("missing-groupby") {
    val spec = header("table-1" -> Map("kind" -> "groupBy"))
    assert(err(spec).contains("groupBy key is required for 'groupBy' tables"))
  }

  test("missing-aggregation") {
    val spec = header("table-1" -> Map("kind" -> "groupBy", "groupBy" -> "id"))
    assert(err(spec).contains("aggregation is required for 'groupBy' tables"))
  }

  test("wrong-type-tables") {
    val spec = header("table-1" -> Map(
      "kind" -> "groupBy", "groupBy" -> "id", "aggregation" -> "lastNotNull")) +
      ("table-1" -> List.empty[Any])
    assert(err(spec).contains("Long format tables must be given kind 'oneToMany'"))
  }

  test("extra-tables") {
    val spec = header("table-1" -> Map("kind" -> "constant")) +
      ("table-1" -> Map.empty[String, Any]) + ("table-2" -> List.empty[Any])
    assert(err(spec).contains(
      "Parser specification has tables not defined in the header: table-2"))
  }

  test("unsupported spec format (epoch.yml)") {
    val e = intercept[IllegalArgumentException](
      AdtlParser.fromFile("src/test/resources/golden/parsers/epoch.yml"))
    assert(e.getMessage.contains("Unsupported file format"))
  }

  // Deferred default-if derivation (parser.py:441-449): the spec itself
  // VALIDATES cleanly — the reference's validate_specification is
  // pydantic-only (python_interface.py:62-71) and _default_if runs at
  // parse time — so the reachable ValueError message surfaces only when a
  // parse forces derivation, never at spec load.
  test("schema-less oneToMany without if: validates cleanly, fails at parse") {
    val spec: Spec.Raw = Map(
      "adtl" -> Map("name" -> "noifspec", "description" -> "d",
        "tables" -> Map("lt" -> Map("kind" -> "oneToMany", "discriminator" -> "attr"))),
      "lt" -> List(Map("attr" -> "a", "value" -> Map("field" -> "f"))))
    Adtl.validateSpecification(spec) // pydantic-parity: loads clean
    val parser = AdtlParser.fromSpec(spec)
    val e = intercept[Spec.SpecValidationError](parser.oneToManyRules)
    assert(e.getMessage ==
      "No required fields found in schema for table 'lt', cannot create default 'if' rules.")
  }

  // test_spec_refs_and_defs.py:73-96 — header/field errors
  test("no-header, malformed-header, non-collection table body") {
    assert(err(Map.empty).contains("adtl\n  Field required"))
    assert(err(Map("adtl" -> Map("name" -> "spec_without_tables")))
      .contains("adtl.description\n  Field required"))
    val spec = header("table-1" -> Map("kind" -> "constant")) + ("table-1" -> (5L: Any))
    assert(err(spec).contains("Table 'table-1' must be either"))
  }
}

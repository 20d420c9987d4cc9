package graft.adtl

import org.scalatest.funsuite.AnyFunSuite
import Spec.Raw

/** Unit tests for default-`if` derivation — the highest-subtlety normalize
  * pass (reference: parser.py:422-499, exhaustively parametrized in
  * tests/test_adtl/test_one_to_many_parser.py; shapes re-pinned here with
  * original fixtures). The derived rule decides which source rows emit a
  * oneToMany entry when the spec author writes no explicit `if`.
  */
class DefaultIfSpec extends AnyFunSuite {

  private val schema: Raw = Map(
    "properties" -> Map(
      "name" -> Map("type" -> "string"),
      "is_present" -> Map("type" -> "boolean"),
      "value" -> Map("type" -> "number")),
    "oneOf" -> List(
      Map("properties" -> Map("name" -> Map("const" -> "a")), "required" -> List("is_present")),
      Map("properties" -> Map("name" -> Map("const" -> "b")), "required" -> List("value"))))

  private def derive(entry: Raw): Raw =
    Normalize.defaultIf("obs", Some(schema), entry)("if").asInstanceOf[Raw]

  test("values-map rule → any-of-mapped-keys condition") {
    val got = derive(Map(
      "name" -> "a",
      "is_present" -> Map("field" -> "cough", "values" -> Map("1" -> true, "0" -> false))))
    assert(got == Map("any" -> List(Map("cough" -> "1"), Map("cough" -> "0"))))
  }

  test("plain field rule → non-empty condition") {
    val got = derive(Map("name" -> "b", "value" -> Map("field" -> "temp")))
    assert(got == Map("temp" -> Map("!=" -> "")))
  }

  test("values-map with ignoreMissingKey → non-empty condition (pass-through keys)") {
    val got = derive(Map(
      "name" -> "a",
      "is_present" -> Map("field" -> "cough",
        "values" -> Map("1" -> true), "ignoreMissingKey" -> true)))
    assert(got == Map("cough" -> Map("!=" -> "")))
  }

  test("can_skip and caseInsensitive flags propagate into the condition") {
    val got = derive(Map(
      "name" -> "a",
      "is_present" -> Map("field" -> "cough", "can_skip" -> true,
        "values" -> Map("YES" -> true), "caseInsensitive" -> true)))
    assert(got == Map("any" -> List(
      Map("cough" -> "YES", "can_skip" -> true, "caseInsensitive" -> true))))
    val got2 = derive(Map(
      "name" -> "b", "value" -> Map("field" -> "temp", "can_skip" -> true)))
    assert(got2 == Map("temp" -> Map("!=" -> ""), "can_skip" -> true))
  }

  test("combinedType rule → union of per-subrule conditions") {
    val got = derive(Map(
      "name" -> "a",
      "is_present" -> Map("combinedType" -> "any", "fields" -> List(
        Map("field" -> "cough", "values" -> Map("1" -> true)),
        Map("field" -> "cough_v2", "can_skip" -> true)))))
    assert(got == Map("any" -> List(
      Map("cough" -> "1"),
      Map("cough_v2" -> Map("!=" -> ""), "can_skip" -> true))))
  }

  test("entry matching no schema-required field raises; schema without required raises") {
    intercept[Spec.SpecValidationError] {
      Normalize.defaultIf("obs", Some(schema), Map("name" -> "a", "other" -> "x"))
    }
    val noRequired: Raw = Map("oneOf" -> List(Map("properties" -> Map("x" -> Map()))))
    val e = intercept[Spec.SpecValidationError] {
      Normalize.defaultIf("obs", Some(noRequired),
        Map("name" -> "a", "is_present" -> Map("field" -> "f")))
    }
    assert(e.getMessage.contains("cannot create default 'if' rules"))
  }

  test("conditional then.required is honored") {
    val condSchema: Raw = Map(
      "oneOf" -> List(
        Map("if" -> Map("properties" -> Map("name" -> Map("const" -> "a"))),
          "then" -> Map("required" -> List("is_present")),
          "properties" -> Map("name" -> Map("const" -> "a")))))
    val got = Normalize.defaultIf("obs", Some(condSchema),
      Map("name" -> "a", "is_present" -> Map("field" -> "cough")))("if").asInstanceOf[Raw]
    assert(got == Map("cough" -> Map("!=" -> "")))
  }

  test("explicit if is left untouched") {
    val entry: Raw = Map("name" -> "a", "if" -> Map("x" -> "1"),
      "is_present" -> Map("field" -> "cough"))
    assert(Normalize.defaultIf("obs", Some(schema), entry) == entry)
  }
}

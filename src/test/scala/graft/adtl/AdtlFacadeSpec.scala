package graft.adtl

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The reference's python_interface surface: adtl.parse writes the same
  * CSV as the snapshot (test_python_interface.py::test_parse),
  * validate_specification accepts the reference specs, and check_mapping
  * raises/warns with the reference's messages
  * (test_spec_checks.py::test_check_mapping_*). */
class AdtlFacadeSpec extends SparkSpec {

  private val golden = "src/test/resources/golden"

  test("parse facade writes {output}-{table}.csv matching the snapshot") {
    val tmp = Files.createTempDirectory("adtlapi").toString
    Adtl.parse(spark, s"$golden/parsers/epoch.json", s"$golden/sources/epoch.csv",
      output = Some(s"$tmp/output"))
    val outDir = Paths.get(s"$tmp/output-table.csv")
    assert(Files.exists(outDir))
    val part = Files.list(outDir).toArray.map(_.toString).find(_.endsWith(".csv")).get
    val lines = Files.readAllLines(Paths.get(part))
    assert(lines.get(0) == "adtl_valid,adtl_error,epoch,id,some_date,text")
    val body = (1 until lines.size).map(lines.get).toSet
    assert(body == Set(
      "True,,1999-01-11,1,1999-01-24,Lorem ipsum",
      "True,,2022-12-19,2,2023-01-27,example"))
  }

  test("validate_specification accepts json, toml and dict specs") {
    Adtl.validateSpecification(s"$golden/parsers/epoch.json")
    Adtl.validateSpecification(s"$golden/parsers/apply.toml")
    Adtl.validateSpecification(Map("adtl" -> Map(
      "name" -> "constant", "description" -> "Fixed table",
      "tables" -> Map("metadata" -> Map("kind" -> "constant"))),
      "metadata" -> Map("dataset" -> "constant", "version" -> "20220505.1",
        "format" -> "csv")): Spec.Raw)
  }

  test("validate_specification accepts every reference if-field structure") {
    // test_python_interface.py::test_validate_if_field_structures — each
    // shape must validate in a wide table (field rule `if`) and in a long
    // table (entry-level `if`), plus the nested-mapping variant
    val ifShapes: List[Spec.Raw] = List(
      Map("field_name" -> "value"),
      Map("field_name" -> Map("!=" -> "UNK")),
      Map("any" -> List(Map("field_name" -> "val1"), Map("field_name" -> "val2"))),
      Map("all" -> List(Map("field_name" -> Map("!=" -> "UNK")),
        Map("field_name" -> Map("!=" -> "NA")))),
      Map("all" -> List(Map("field_name" -> Map("!=" -> "UNK")),
        Map("other_field" -> 1L))),
      Map("not" -> Map("field_name" -> "excluded_value")),
      Map("not" -> Map("field_name" -> Map("==" -> "excluded"))))
    ifShapes.foreach { shape =>
      Adtl.validateSpecification(Map(
        "adtl" -> Map("name" -> "w", "description" -> "d",
          "tables" -> Map("t" -> Map("kind" -> "oneToOne"))),
        "t" -> Map("field_a" -> Map("field" -> "source_field", "if" -> shape))): Spec.Raw)
      Adtl.validateSpecification(Map(
        "adtl" -> Map("name" -> "l", "description" -> "d",
          "tables" -> Map("lt" -> Map("kind" -> "oneToMany", "discriminator" -> "attr"))),
        "lt" -> List(Map("attr" -> "a",
          "value" -> Map("field" -> "source_field"), "if" -> shape))): Spec.Raw)
      // nested field mapping carrying the if (value_num-style)
      Adtl.validateSpecification(Map(
        "adtl" -> Map("name" -> "n", "description" -> "d",
          "tables" -> Map("lt" -> Map("kind" -> "oneToMany", "discriminator" -> "attr"))),
        "lt" -> List(Map("attr" -> "a",
          "value_num" -> Map("field" -> "source_field", "if" -> shape)))): Spec.Raw)
    }
  }

  test("check_mapping raises on absent fields, warns on unmapped columns") {
    val tmp = Files.createTempDirectory("adtlchk").toString
    Files.writeString(Paths.get(s"$tmp/missing_field.csv"),
      "subjid,dsstdat,hostdat\nS001,2020-06-01,2020-05-20\n")
    val e = intercept[IllegalArgumentException](
      Adtl.checkMapping(spark, s"$golden/parsers/groupBy.json",
        s"$tmp/missing_field.csv"))
    assert(e.getMessage.startsWith(
      "There are 1 fields present in your spec file, but not in the dataset:"))
    assert(e.getMessage.contains("\n - sex"))

    Files.writeString(Paths.get(s"$tmp/extra_field.csv"),
      "subjid,sex,dsstdat,hostdat,extra_field\nS001,M,2020-06-01,2020-05-20,123\n")
    val warning = Adtl.checkMapping(spark, s"$golden/parsers/groupBy.json",
      s"$tmp/extra_field.csv")
    assert(warning.contains("There are 1 fields missing from your spec file:\n - extra_field"))
  }
}

package graft.adtl

import graft.SparkSpec
import graft.adtl.autoparser.DictReader

/** G3 against the reference's own fixture: sample_data_dict.csv (a
  * REDCap-style dictionary) normalizes through the configured column
  * mappings with parsed choices, and duplicate fields fail with the
  * reference's message (test_dict_reader.py). */
class DictReaderGoldenSpec extends SparkSpec {

  private val golden = "src/test/resources/golden/autoparser"
  private val mappings = Map(
    "source_field" -> "Variable / Field Name",
    "source_description" -> "Field Label",
    "source_type" -> "Field Type",
    "choices" -> "Choices, Calculations, OR Slider Labels")

  private def readDd() = spark.read.option("header", "true")
    .csv(s"$golden/sample_data_dict.csv")

  test("golden: duplicate descriptions fail with the reference's message") {
    // supper_trcntry and supper_trcntry_2 share a description — the unique
    // check flags both rows, hence "2 errors" like pandera's failure cases
    val e = intercept[IllegalArgumentException](
      DictReader.validateDictionary(spark, readDd(), mappings,
        choiceDelimiter = "|", choiceDelimiterMap = ","))
    assert(e.getMessage.startsWith("Data dictionary validation failed with 2 error"))
  }

  test("golden: normalized dictionary parses REDCap choices") {
    import org.apache.spark.sql.functions._
    // drop the duplicated row like the reference fixture does (row index 8)
    val dd = readDd().withColumn("__rid", monotonically_increasing_id())
      .filter(col("__rid") =!= 8).drop("__rid")
    val entries = DictReader.validateDictionary(spark, dd, mappings,
      choiceDelimiter = "|", choiceDelimiterMap = ",")
    assert(entries.map(_.choices) == List(
      None, None, None, None, None, None,
      Some(Map("1" -> "kg", "2" -> "lbs")),
      Some(Map("1" -> "Afghanistan", "2" -> "Albania", "3" -> "Algeria", "4" -> "Andorra")),
      Some(Map("1" -> "°C", "2" -> "°F"))))
    assert(entries.head.sourceField == "subjid")
    assert(entries(1).sourceDescription.contains("Date of Enrolment"))
  }

  test("common values lowercase and dedupe (test_process_dict)") {
    import spark.implicits._
    // the reference's test frame (test_dict_reader.py test_process_dict)
    val dd = Seq(
      ("field_1", "name", "string", null.asInstanceOf[String]),
      ("field_2", "alive", "str", "Oui, NON, OUI, oui"),
      ("field_3", "species", "choice", "cat, dog, fish"))
      .toDF("source_field", "source_description", "source_type", "common_values")
    val entries = DictReader.validateDictionary(spark, dd)
    assert(entries.map(_.commonValues.map(_.toSet)) == List(
      None, Some(Set("oui", "non")), Some(Set("cat", "dog", "fish"))))
  }

  test("pandera parity: neither value column, missing source_type, both columns") {
    import spark.implicits._
    // zero of common_values/choices present + no source_type column:
    // one_value_column check (1) + missing required column (1) = 2 errors
    val slim = Seq(("f1", "d1"), ("f2", "d2"))
      .toDF("source_field", "source_description")
    val e1 = intercept[IllegalArgumentException](
      DictReader.validateDictionary(spark, slim))
    assert(e1.getMessage.startsWith("Data dictionary validation failed with 2 error"))
    // both value columns present fails the exactly-one check
    val both = Seq(("f1", "d1", "t", "a, b", "a=1"))
      .toDF("source_field", "source_description", "source_type",
        "common_values", "choices")
    val e2 = intercept[IllegalArgumentException](
      DictReader.validateDictionary(spark, both))
    assert(e2.getMessage.startsWith("Data dictionary validation failed with 1 error"))
    // null source_type cells each count
    val nulls = Seq(("f1", "d1", null.asInstanceOf[String], "a, b"),
      ("f2", "d2", "string", "c"))
      .toDF("source_field", "source_description", "source_type", "common_values")
    val e3 = intercept[IllegalArgumentException](
      DictReader.validateDictionary(spark, nulls))
    assert(e3.getMessage.startsWith("Data dictionary validation failed with 1 error"))
  }
}

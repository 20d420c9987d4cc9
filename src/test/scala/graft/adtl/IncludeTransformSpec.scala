package graft.adtl

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** F17 from the CLI: `--include-transform` resolves a named transform
  * provider (or class name) and makes its functions available to `apply`
  * rules, mirroring the reference's custom_transformations.toml flow. */
class IncludeTransformSpec extends SparkSpec {

  test("--include-transform wires provider functions into the CLI parse") {
    spark // ensure the shared session exists so Main doesn't stop it
    val tmp = Files.createTempDirectory("adtlcli").toString
    Files.writeString(Paths.get(s"$tmp/data.csv"),
      "subjid,type\nS007,fish\nS008,cat\n")
    Files.writeString(Paths.get(s"$tmp/spec.toml"),
      """[adtl]
        |name = "cli-transform"
        |description = "custom transform via CLI"
        |
        |[adtl.tables.subject]
        |kind = "oneToOne"
        |
        |[subject]
        |subject_id = { field = "subjid" }
        |animal_type = { field = "type", apply = { function = "capitalise" } }
        |""".stripMargin)

    Main.main(Array("parse", s"$tmp/spec.toml", s"$tmp/data.csv",
      "-o", s"$tmp/out", "--include-transform",
      "graft.adtl.TestTransformProvider"))

    val outFile = Files.list(Paths.get(s"$tmp/out-subject.csv")).toArray
      .map(_.toString).find(_.endsWith(".csv")).get
    val lines = Files.readAllLines(Paths.get(outFile))
    assert(lines.get(0) == "animal_type,subject_id")
    val body = (1 until lines.size).map(lines.get).toSet
    assert(body == Set("FISH,S007", "CAT,S008"))
  }

  test("unknown provider fails with the reference's message shape") {
    val e = intercept[java.io.FileNotFoundException](
      Transformations.registryWith("does.not.Exist"))
    assert(e.getMessage.startsWith("No such file:"))
  }

  test("programmatically registered provider resolves by name") {
    Transformations.registerProvider(new TestTransformProvider)
    val reg = Transformations.registryWith("test-transforms")
    assert(reg.contains("capitalise"))
  }
}

/** Example provider (the JVM analogue of custom_transforms.py). */
final class TestTransformProvider extends Transformations.TransformProvider {
  override def name: String = "test-transforms"
  override def transforms: Map[String, Transformations.TransformFn] = Map(
    "capitalise" -> ((v, _, _) => org.apache.spark.sql.functions.upper(v)))
}

package graft.adtl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Library facade mirroring the reference's public Python API
  * (src/adtl/python_interface.py; studied, not copied): one-call parse,
  * spec validation without execution, and spec-vs-data field checking
  * with the reference's message shapes.
  */
object Adtl {

  /** Parse a CSV according to a specification, optionally saving every
    * table as `{output|specName}-{table}.{csv,parquet}`; returns the
    * parsed tables (python_interface.py:14-59). */
  def parse(
      spark: SparkSession,
      spec: String,
      file: String,
      output: Option[String] = None,
      encoding: String = "UTF-8",
      includeDefs: List[String] = Nil,
      includeTransform: Option[String] = None,
      saveAs: Option[String] = Some("csv")): Map[String, DataFrame] = {
    val registry = includeTransform
      .map(Transformations.registryWith)
      .getOrElse(Transformations.newRegistry())
    val parser = AdtlParser.fromFile(spec, includeDefs, registry)
    if (parser.spec.header.returnUnmatched && saveAs.contains("parquet"))
      throw new IllegalArgumentException(
        "returnUnmatched and parquet options are incompatible")
    val tables = parser.parseCsv(spark, file, encoding)
    saveAs.foreach { fmt =>
      parser.save(tables, output.getOrElse(parser.spec.header.name), fmt)
    }
    tables
  }

  /** Validate a specification file (or parsed tree) without running it
    * (python_interface.py:62-71); throws SpecValidationError. */
  def validateSpecification(spec: String): Unit = {
    AdtlParser.fromFile(spec); ()
  }

  def validateSpecification(spec: Spec.Raw): Unit = {
    AdtlParser.fromSpec(spec); ()
  }

  /** Check the spec's `field` references against a data file's columns:
    * spec fields absent from the data raise with the reference's message;
    * unmapped data columns return (and print) the reference's warning
    * (python_interface.py:74-103). */
  def checkMapping(spark: SparkSession, spec: String, data: String): Option[String] = {
    val parser = AdtlParser.fromFile(spec)
    val columns = spark.read.option("header", "true").csv(data).columns.toSeq
    val (missing, absent) = parser.checkSpecFields(columns)
    if (absent.nonEmpty) {
      val msg = s"There are ${absent.size} fields present in your spec file, " +
        "but not in the dataset:" +
        absent.toList.sorted.map(f => s"\n - $f").mkString
      throw new IllegalArgumentException(msg)
    }
    if (missing.nonEmpty) {
      val msg = s"There are ${missing.size} fields missing from your spec file:" +
        missing.toList.sorted.map(f => s"\n - $f").mkString
      System.err.println(s"Warning: $msg")
      Some(msg)
    } else None
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9: data/mapping-file reader with the reference's format dispatch
  * (/root/reference/src/adtl/autoparser/util.py:28-46; studied, not
  * copied): CSV, XLSX, or parquet by suffix; anything else raises the
  * reference's "Unsupported format" error.
  *
  * CSV and parquet go through Spark's distributed scans (splittable,
  * predicate/column pushdown intact). XLSX — a single non-splittable
  * ZIP — is parsed driver-side by [[XlsxReader]] and parallelized;
  * appropriate for the spreadsheet-sized dictionary/mapping inputs the
  * reference feeds through this path.
  */
object DataReader {

  def readData(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".csv"))
      spark.read.option("header", "true").csv(path)
    else if (path.endsWith(".xlsx"))
      XlsxReader.read(spark, path)
    else if (path.endsWith(".parquet"))
      spark.read.parquet(path)
    else
      throw new IllegalArgumentException(
        s"Unsupported format (not CSV, XLSX or parquet): $path")
}

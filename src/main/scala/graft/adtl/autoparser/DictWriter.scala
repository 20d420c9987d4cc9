package graft.adtl.autoparser

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-dictionary inference (autoparser G1) as a distributed Spark job —
  * the only autoparser component that touches data. Mirrors the behavior of
  * DictWriter.create_dict (/root/reference/src/adtl/autoparser/
  * dict_writer.py:84-185; studied, not copied):
  *
  *  - dtype → {string, number, date, boolean, list} field types
  *  - "common values": distinct values whose total frequency passes a
  *    threshold, suppressed when the column looks free-text/identifier-like
  *    (privacy guard: more than maxCommonCount distinct or > 30% of rows)
  *  - bracketed/comma list-column detection from value shapes
  *
  * One pass for types + one aggregation per column batch for value counts;
  * scales linearly — no collect of raw data, only of the (small) distinct
  * value summaries.
  */
object DictWriter {

  final case class FieldInfo(
      name: String,
      fieldType: String,
      commonValues: List[String])

  def createDict(
      spark: SparkSession, df: DataFrame,
      maxCommonCount: Int = 25, minCommonFrac: Double = 0.001): List[FieldInfo] = {
    val n = df.count().max(1L)
    df.schema.fields.toList.map { f =>
      val c = col(f.name)
      val inferredType = f.dataType match {
        case _: NumericType => "number"
        case BooleanType => "boolean"
        case DateType | TimestampType => "date"
        case _: ArrayType => "list"
        case _ =>
          // string columns: probe value shapes on a sample
          val sample = df.select(c.cast("string").as("v"))
            .filter(col("v").isNotNull && col("v") =!= "").limit(1000)
          val shapes = sample.select(
            sum(when(col("v").rlike("^-?\\d+(\\.\\d+)?$"), 1).otherwise(0)).as("num"),
            sum(when(col("v").rlike("^\\d{4}-\\d{2}-\\d{2}") ||
              col("v").rlike("^\\d{1,2}/\\d{1,2}/\\d{2,4}$"), 1).otherwise(0)).as("date"),
            sum(when(col("v").rlike("^\\[.*\\]$") || col("v").contains(","), 1).otherwise(0)).as("lst"),
            count(lit(1)).as("n")).collect()(0)
          val total = shapes.getAs[Long]("n").max(1L)
          if (shapes.getAs[Long]("num") == total) "number"
          else if (shapes.getAs[Long]("date") == total) "date"
          else if (shapes.getAs[Long]("lst").toDouble / total > 0.8) "list"
          else "string"
      }
      val common: List[String] =
        if (inferredType == "number" || inferredType == "date") Nil
        else {
          val counts = df.select(c.cast("string").as("v"))
            .filter(col("v").isNotNull && col("v") =!= "")
            .groupBy("v").count()
            .orderBy(col("count").desc, col("v"))
            .limit(maxCommonCount + 1)
            .collect().map(r => r.getString(0) -> r.getLong(1)).toList
          // privacy guard: identifier-like columns (too many distinct values)
          // never emit value lists
          if (counts.length > maxCommonCount) Nil
          else if (counts.map(_._2).sum.toDouble / n < 0.3) Nil
          else counts.filter(_._2.toDouble / n >= minCommonFrac).map(_._1).sorted
        }
      FieldInfo(f.name, inferredType, common)
    }
  }

  /** Render the dictionary as the CSV-ish rows the mapping stage consumes. */
  def toDataFrame(spark: SparkSession, dict: List[FieldInfo]): DataFrame = {
    import spark.implicits._
    dict.map(f => (f.name, f.fieldType, f.commonValues.mkString(", ")))
      .toDF("source_field", "source_type", "common_values")
  }
}

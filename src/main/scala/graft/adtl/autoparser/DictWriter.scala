package graft.adtl.autoparser

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-dictionary inference (autoparser G1) as a distributed Spark job —
  * the only autoparser component that touches data. Faithful to
  * DictWriter.create_dict (/root/reference/src/adtl/autoparser/
  * dict_writer.py:84-185; studied, not copied):
  *
  *  - field type from the frame's dtype (numeric → number, timestamp →
  *    date, boolean → boolean, everything else string);
  *  - a string column whose values contain '[' or ',' is a LIST column:
  *    values split on commas (brackets stripped, elements trimmed) and the
  *    elements re-counted;
  *  - "common values": the distinct values, frequency-descending with
  *    first-appearance tie-break, kept only when (after an optional
  *    minimum-frequency filter) there are ≤ maxCommonCount of them;
  *    singleton values are dropped — the reference's privacy guard against
  *    emitting identifier-like columns;
  *  - small datasets (maxCommonCount > 30% of rows) reduce the cap and
  *    force a 5% minimum frequency, as the reference warns and does.
  *
  * Per column: one aggregation over (value, count, first-seen) and a
  * driver collect only when the distinct count is under the cap — no raw
  * data is ever collected, so the pass scales linearly.
  */
object DictWriter {

  final case class FieldInfo(
      name: String,
      fieldType: String,
      commonValues: List[String])

  def createDict(
      spark: SparkSession, df: DataFrame,
      maxCommonCount: Int = 25, // the reference's config default (config.py max_common_count)
      minCommonFreq: Option[Double] = None): List[FieldInfo] = {
    val n = df.count().max(1L)
    val (maxCc, minFreq) =
      if (n * 0.3 < maxCommonCount) {
        System.err.println(
          s"Warning: Small Dataset: max_common_count of '$maxCommonCount' is too " +
            s"high for a dataset with $n rows. Reducing to ${n * 0.3} and " +
            "setting the minimum frequency to 5% of the dataset.")
        (n * 0.3, Some(0.05))
      } else (maxCommonCount.toDouble, minCommonFreq)
    val rid = monotonically_increasing_id()

    def inferField(f: StructField): FieldInfo = {
      val baseType = f.dataType match {
        case _: NumericType => "number"
        case DateType | TimestampType => "date"
        case BooleanType => "boolean"
        case _ => "string"
      }
      if (baseType != "string") FieldInfo(f.name, baseType, Nil)
      else {
        val c = col(f.name).cast("string")
        val present = df.select(c.as("v"), rid.as("r"))
          .filter(col("v").isNotNull && col("v") =!= "")
        val isList = present
          .filter(col("v").contains("[") || col("v").contains(","))
          .limit(1).count() > 0
        val values =
          if (isList)
            present.select(explode(transform(
              split(regexp_replace(col("v"), "^[\\[\\]]+|[\\[\\]]+$", ""), ","),
              x => trim(x))).as("v"), col("r"))
          else present
        var counts = values.groupBy("v")
          .agg(count(lit(1)).as("cnt"), min(col("r")).as("first_seen"))
        minFreq.foreach { mf =>
          counts = counts.filter(col("cnt") > math.max(1.0, n * mf))
        }
        // privacy guard: the collect is bounded at cap+1 rows, so
        // identifier-like columns never stream to the driver — one extra
        // row decides over-cap without a separate count() job
        val capped = counts
          .orderBy(col("cnt").desc, col("first_seen").asc)
          .limit(maxCc.toInt + 1).collect()
        val common: List[String] =
          if (capped.isEmpty || capped.length > maxCc) Nil
          else capped.filter(_.getLong(1) > 1).map(_.getString(0)).toList
        FieldInfo(f.name, if (isList) "list" else "string", common)
      }
    }
    // columns profile independently — run their (tiny, two-job) pipelines
    // concurrently; result order stays the schema order
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    df.schema.fields.toList
      .map(f => Future(inferField(f)))
      .map(Await.result(_, Duration.Inf))
  }

  /** Render the dictionary as the CSV-ish rows the mapping stage consumes. */
  def toDataFrame(spark: SparkSession, dict: List[FieldInfo]): DataFrame = {
    import spark.implicits._
    dict.map(f => (f.name, f.fieldType, f.commonValues.mkString(", ")))
      .toDF("source_field", "source_type", "common_values")
  }
}

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

    def baseType(f: StructField): String = f.dataType match {
      case _: NumericType => "number"
      case DateType | TimestampType => "date"
      case BooleanType => "boolean"
      case _ => "string"
    }
    val stringFields = df.schema.fields.toList.filter(baseType(_) == "string")

    // Fixed TWO profiling scans regardless of column count — per-column
    // jobs would re-read the table 2x per string column, the wrong shape
    // for wide tables at scale. Scan 1: every column's list-ness in one
    // aggregation. Scan 2: all columns' value counts at once via a stacked
    // (column, value) projection.
    val isList: Map[String, Boolean] =
      if (stringFields.isEmpty) Map.empty
      else {
        val aggExprs = stringFields.map { f =>
          val v = col(f.name).cast("string")
          max(v.isNotNull && v =!= "" &&
            (v.contains("[") || v.contains(","))).as(f.name)
        }
        val row = df.agg(aggExprs.head, aggExprs.tail: _*).head
        stringFields.map { f =>
          val i = row.fieldIndex(f.name)
          f.name -> (!row.isNullAt(i) && row.getBoolean(i))
        }.toMap
      }
    val listCols = stringFields.map(_.name).filter(isList)

    val common: Map[String, List[String]] =
      if (stringFields.isEmpty) Map.empty
      else {
        val structs = stringFields.map(f =>
          struct(lit(f.name).as("c"), col(f.name).cast("string").as("v")))
        val stacked = df.select(rid.as("r"), explode(array(structs: _*)).as("s"))
          .select(col("r"), col("s.c").as("c"), col("s.v").as("v"))
          .filter(col("v").isNotNull && col("v") =!= "")
        val values = stacked.withColumn("va",
            when(col("c").isin(listCols: _*),
              transform(split(regexp_replace(col("v"), "^[\\[\\]]+|[\\[\\]]+$", ""), ","),
                x => trim(x)))
              .otherwise(array(col("v"))))
          .select(col("c"), col("r"), explode(col("va")).as("v"))
        var counts = values.groupBy("c", "v")
          .agg(count(lit(1)).as("cnt"), min(col("r")).as("first_seen"))
        minFreq.foreach { mf =>
          counts = counts.filter(col("cnt") > math.max(1.0, n * mf))
        }
        // privacy guard: the collect is bounded at (cap+1) rows PER COLUMN
        // (one extra row decides over-cap), so identifier-like columns
        // never stream to the driver
        val perCol = org.apache.spark.sql.expressions.Window.partitionBy("c")
        val collected = counts
          .withColumn("rn", row_number().over(
            perCol.orderBy(col("cnt").desc, col("first_seen").asc)))
          .withColumn("dcount", count(lit(1)).over(perCol))
          .filter(col("rn") <= maxCc.toInt + 1)
          .collect()
        collected.groupBy(_.getString(0)).map { case (c, rows) =>
          val dcount = rows.head.getAs[Long]("dcount")
          c -> (if (dcount > maxCc) Nil
                else rows.sortBy(_.getAs[Int]("rn"))
                  .filter(_.getAs[Long]("cnt") > 1)
                  .map(_.getString(1)).toList)
        }
      }

    df.schema.fields.toList.map { f =>
      baseType(f) match {
        case "string" => FieldInfo(f.name,
          if (isList(f.name)) "list" else "string",
          common.getOrElse(f.name, Nil))
        case t => FieldInfo(f.name, t, Nil)
      }
    }
  }

  /** Render the dictionary as the CSV-ish rows the mapping stage consumes. */
  def toDataFrame(spark: SparkSession, dict: List[FieldInfo]): DataFrame = {
    import spark.implicits._
    dict.map(f => (f.name, f.fieldType, f.commonValues.mkString(", ")))
      .toDF("source_field", "source_type", "common_values")
  }
}

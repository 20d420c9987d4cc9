package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed corpus-preparation pipeline: the shape a pretraining data run
  * takes — quality gate, then exact dedup among survivors (keep lowest id
  * per canonical fingerprint), with hooks for the near-dup stages.
  *
  * Single scan + one window shuffle on the 16-byte fingerprint; near-dup
  * stages (MinHash/SimHash/embedding) chain on the output as candidate-pair
  * removals.
  */
object Pipeline {

  def cleanCorpus(df: DataFrame, idCol: String, textCol: String,
      minQuality: Double): DataFrame = {
    val quality = TextAnalysis.qualityScore(col(textCol))
    val fp = TextAnalysis.fingerprint(col(textCol))
    val survivors = df
      .withColumn("quality_score", quality)
      .filter(col("quality_score") >= minQuality)
      .withColumn("__fp", fp)
    val keeper = min(col(idCol)).over(Window.partitionBy(col("__fp")))
    survivors
      .withColumn("__keep", keeper === col(idCol))
      .filter(col("__keep"))
      .drop("__fp", "__keep")
  }
}

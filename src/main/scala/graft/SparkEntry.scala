package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory names (SURVEY.md §2) to Spark plans over
  * the testdata tables; `oracleSql` holds the equivalent DuckDB SQL for the
  * driver's hash-compare. Query groups live under graft.queries.*.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** Merge the per-file gate maps, REFUSING silent key shadowing: `++`
    * would let a later file's gate replace an earlier one's without any
    * signal (round 13 nearly lost the q_sessionize count gate to a new
    * same-named gate — the suite shrank by one and nothing failed). */
  private def mergeGates[V](parts: Seq[Map[String, V]]): Map[String, V] = {
    val dupes = parts.flatMap(_.keys).groupBy(identity)
      .collect { case (k, ks) if ks.size > 1 => k }
    require(dupes.isEmpty,
      s"duplicate gate keys across query files: ${dupes.toSeq.sorted.mkString(", ")}")
    parts.reduce(_ ++ _)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    mergeGates(Seq(
      graft.queries.Relational.queries,
      graft.queries.AdtlOps.queries,
      graft.queries.EngineQueries.queries,
      graft.queries.PipelineQueries.queries,
      graft.queries.AnalyticsQueries.queries))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    mergeGates(Seq(
      graft.queries.Relational.oracles,
      graft.queries.AdtlOps.oracles,
      graft.queries.EngineQueries.oracles,
      graft.queries.PipelineQueries.oracles,
      graft.queries.AnalyticsQueries.oracles))
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AdvancedQueries, AnalyticsQueries, EngineQueries, GeoTemporalQueries, HistogramQueries, LlmQueries, MiningQueries, PipelineQueries, Q, Relational, SqlSuiteQueries, SqlTpchQueries, StreamingQueries, TemporalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-module registries; each [[graft.queries.Q]]
  * pairs a Spark implementation with its DuckDB oracle SQL (when
  * SQL-expressible).
  */
object SparkEntry {

  private def registry: Seq[Q] =
    Relational.all ++ AdvancedQueries.all ++ HistogramQueries.all ++
      TemporalQueries.all ++ LlmQueries.all ++ PipelineQueries.all ++
      EngineQueries.all ++ GeoTemporalQueries.all ++ AnalyticsQueries.all ++
      SqlSuiteQueries.all ++ MiningQueries.all ++ SqlTpchQueries.all ++
      StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

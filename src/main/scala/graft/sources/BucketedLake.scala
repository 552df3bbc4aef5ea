package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins: both sides of a repeated
  * fact⋈fact join written with the same bucket count on the join key join
  * shuffle-free (sort-merge over pre-bucketed files, zero Exchange).
  * This is the 100 TB answer for the engine's recurring joins —
  * flows⋈ledger on (pubdate, equipment), lineitem⋈orders on orderkey —
  * where re-shuffling terabytes per query would dominate cost.
  */
object BucketedLake {

  /** Write `df` as a bucketed external table at `path`. */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      bucketCol: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the co-location check used by specs and plan audits. Any `Exchange`
    * node counts as a shuffle (hash, range, round-robin from
    * repartition(n), SinglePartition from global aggregates/coalesce(1))
    * EXCEPT broadcast and reused exchanges, which move no shuffle data. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString()
      .linesIterator
      .exists(l => l.contains("Exchange") &&
        !l.contains("BroadcastExchange") && !l.contains("ReusedExchange"))
}

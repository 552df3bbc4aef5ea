package graft.runtime

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager lifetime management for checkpoint-backed plans.
  *
  * `Dataset.localCheckpoint()` persists an internal RDD that
  * `Dataset.unpersist()` does NOT release (that call only talks to the
  * SQL cache manager), and the ContextCleaner reclaims it only after a
  * driver GC notices the reference is gone. A long-lived session running
  * hundreds of iterative queries therefore accumulates checkpointed
  * partitions, shuffle files, and broadcasts until executor memory
  * thrashes — a 2-65× per-query slowdown at the tail of a 129-query
  * bench run, with completely healthy plans.
  *
  * Contract used across graft's iterative operators (PageRank, BFS,
  * connected components, the corpus pipeline): each round's checkpoint
  * is released via [[release]] as soon as the next round's eager
  * checkpoint has materialized, so in-flight state is bounded by two
  * rounds regardless of iteration count, and at most the single
  * checkpoint backing the RETURNED DataFrame survives the call. Session
  * owners (Bench, Verify, notebooks) reclaim that remainder between
  * queries with [[releaseAll]].
  *
  * WARNING: a localCheckpoint truncates lineage — its RDD is the only
  * copy of the data. [[release]] must only be called on checkpoints the
  * caller owns AND no longer needs; a released checkpoint cannot be
  * recomputed.
  */
object Lifetime {

  /** The persisted RDDs backing `df`'s plan (one per localCheckpoint /
    * LogicalRDD leaf; empty for plans with no checkpointed subtree). */
  def checkpointRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }

  /** Unpersist every checkpoint RDD in `df`'s plan. Idempotent. Only
    * call on checkpoint-backed DataFrames this code created and fully
    * consumed — the data is unrecoverable afterwards. */
  def release(df: DataFrame, blocking: Boolean = false): Unit =
    checkpointRdds(df).foreach(_.unpersist(blocking))

  /** Session-wide reclaim: drop every cached table/DataFrame and every
    * persistent RDD (checkpoints included). For session owners between
    * independent queries — any still-lazy plan over a released
    * checkpoint fails loudly rather than recomputing. */
  def releaseAll(spark: SparkSession, blocking: Boolean = false): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking))
  }
}

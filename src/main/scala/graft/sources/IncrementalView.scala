package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a [[CommitLog]]
  * table.
  *
  * The 100 TB problem: a dashboard aggregate (`GROUP BY day, …`) over a
  * lake that receives daily upserts either re-scans the whole lake per
  * refresh, or goes stale. The commit log already records exactly which
  * partitions each commit touched, and copy-on-write upserts leave the
  * current snapshot as the touched partitions' POST-IMAGE — so a view
  * whose grouping includes the partition column can be refreshed by
  * recomputing ONLY the touched partitions' groups and replacing those
  * partitions in the view table ([[CommitLog.replacePartitions]]).
  * Refresh cost scales with the day's churn, never the lake.
  *
  * Correctness comes from three commit-log properties, not from trusting
  * the delta math:
  *  - group locality: `partitionCol ∈ groupCols` is REQUIRED, so every
  *    group is a function of exactly one base partition — the recompute
  *    is a from-scratch aggregate of that partition's current rows (no
  *    incremental subtraction, hence no non-invertible-aggregate
  *    problem: min/max/distinct all work);
  *  - the refresh ledger: the base version refreshed to rides the view
  *    commit as its `batchId`, so a replayed/concurrent refresh of the
  *    same version is a no-op, and `lastRefreshed` is recoverable from
  *    the view's own log — no side state to lose;
  *  - vacuumed history degrades loudly to a FULL refresh (every
  *    partition recomputed), never to a wrong answer.
  *
  * The view is itself a commit-log table: snapshot-isolated reads, time
  * travel over refresh history, and its own vacuum retention.
  *
  * The reference regenerates its reports from the full table on every
  * run (`/root/reference/src/generate_report.py` recomputes each month's
  * block); this is that report, kept fresh for a lake the reference's
  * single-node rescan could never finish.
  */
object IncrementalView {

  /** A view definition: `SELECT groupCols…, aggs… FROM base GROUP BY
    * groupCols` with `partitionCol ∈ groupCols`. `aggs` must be aliased
    * aggregate Columns (they become the view's value columns). */
  final case class Definition(
      baseDir: String, viewDir: String, partitionCol: String,
      groupCols: Seq[String], aggs: Seq[Column]) {
    require(groupCols.contains(partitionCol),
      s"group locality requires partitionCol '$partitionCol' in " +
        s"groupCols ${groupCols.mkString("(", ",", ")")}")
    require(aggs.nonEmpty, "a view needs at least one aggregate")
  }

  /** The base version the view last refreshed to (from the view's own
    * ledger), or None before the first refresh. */
  def lastRefreshed(spark: SparkSession, d: Definition): Option[Long] =
    CommitLog.latest(spark, d.viewDir).flatMap(_.batches.maxOption)

  /** The view's current content (snapshot-isolated). */
  def read(spark: SparkSession, d: Definition): DataFrame =
    CommitLog.read(spark, d.viewDir)

  private def aggregate(df: DataFrame, d: Definition): DataFrame =
    df.groupBy(d.groupCols.map(col): _*).agg(d.aggs.head, d.aggs.tail: _*)

  /** Bring the view up to the base's latest version. Returns the touched
    * partition VALUES that were recomputed (empty when already fresh;
    * every partition on bootstrap or vacuumed-history fallback).
    *
    * Incremental path: [[CommitLog.partsBetween]] names the partitions
    * the base commits in `(lastRefreshed, latest]` touched; their current
    * rows are re-read through [[CommitLog.readPartitions]] (file pruning
    * off the committed list — nothing else is scanned), re-aggregated,
    * and swapped into the view via [[CommitLog.replacePartitions]] with
    * `batchId = latest`. A base partition whose rows all vanished yields
    * no replacement rows, so its view groups are dropped — deletes
    * propagate. */
  def refresh(spark: SparkSession, d: Definition): Seq[String] = {
    val base = CommitLog.latest(spark, d.baseDir).getOrElse(
      throw new IllegalStateException(s"${d.baseDir} has no commit log"))
    lastRefreshed(spark, d) match {
      case None =>
        // bootstrap: full aggregate, written partitioned, logged with the
        // base version already in the ledger
        val full = aggregate(CommitLog.read(spark, d.baseDir), d)
        full.write.partitionBy(d.partitionCol).parquet(d.viewDir)
        CommitLog.init(spark, d.viewDir, initBatches = Seq(base.version))
        Seq("*")
      case Some(v) if v >= base.version => Nil // already fresh
      case Some(v) =>
        val touched = CommitLog.partsBetween(spark, d.baseDir, v, base.version)
        val partVals: Seq[String] = touched match {
          case Some(dirs) =>
            dirs.toSeq.sorted.map(p =>
              org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                .unescapePathName(p.stripPrefix(d.partitionCol + "=")))
          case None =>
            System.err.println(s"[incrview] base history for ${d.baseDir} " +
              s"vacuumed below $v — falling back to a full refresh")
            CommitLog.read(spark, d.baseDir)
              .select(col(d.partitionCol).cast("string")).distinct()
              .collect().map(_.getString(0)).toSeq.sorted
        }
        if (partVals.isEmpty) {
          // data commits in range touched nothing (e.g. pure compactions):
          // record the catch-up so the next refresh diffs from here
          CommitLog.replacePartitions(spark,
            CommitLog.read(spark, d.viewDir).limit(0), d.viewDir,
            d.partitionCol, Nil, batchId = Some(base.version))
          return Nil
        }
        val post = aggregate(
          CommitLog.readPartitions(spark, d.baseDir, d.partitionCol, partVals), d)
        CommitLog.replacePartitions(spark, post, d.viewDir, d.partitionCol,
          partVals, batchId = Some(base.version))
        partVals
    }
  }
}

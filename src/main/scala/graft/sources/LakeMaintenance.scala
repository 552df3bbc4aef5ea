package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for the parquet lake. Incremental ingest writes
  * one file batch per run (the reference lands ~100 tiny objects/day);
  * at scale the accumulated file count dominates scan planning cost.
  * Compaction rewrites a directory to `targetPartitions` files and swaps
  * it in (write-validate-rename — never in place).
  *
  * SINGLE-WRITER CONTRACT: callers must not run compaction concurrently
  * with ingest into the same directory — the rewrite snapshots the file
  * listing, so files appended mid-compaction would be silently dropped
  * by the swap. (True concurrent maintenance needs a transactional table
  * format; plain parquet directories have no commit protocol.) The
  * two-rename swap also has a crash window between renames: recovery is
  * manual (`dir__old` still holds the data); a leftover `dir__old` from
  * a crashed run fails the next run loudly instead of nesting renames.
  */
object LakeMaintenance {

  final case class CompactionStats(filesBefore: Long, filesAfter: Long, rows: Long)

  def compact(spark: SparkSession, dir: String, targetPartitions: Int): CompactionStats = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(dir + "__old")
    require(!fs.exists(old),
      s"$old exists — a previous compaction crashed mid-swap; recover or remove it first")

    val df = spark.read.parquet(dir)
    val rows = df.count()
    val filesBefore = df.select(input_file_name()).distinct().count()

    val tmp = dir + "__compacting"
    df.repartition(targetPartitions).write.mode(SaveMode.Overwrite).parquet(tmp)

    val written = spark.read.parquet(tmp)
    require(written.count() == rows,
      s"compaction row-count mismatch in $dir — aborting swap")
    val filesAfter = written.select(input_file_name()).distinct().count()

    require(fs.rename(new Path(dir), old), s"cannot stage $dir aside")
    if (!fs.rename(new Path(tmp), new Path(dir))) {
      fs.rename(old, new Path(dir)) // roll back
      throw new IllegalStateException(s"compaction swap failed for $dir")
    }
    fs.delete(old, true)
    CompactionStats(filesBefore, filesAfter, rows)
  }

  /** Write a corpus as `nShards` training shards: range-partitioned on
    * the id (each shard owns a contiguous, disjoint id interval — a
    * reader can map shard → id range without an index) and sorted within
    * each shard so downstream packing/streaming reads are sequential.
    * repartitionByRange samples the key distribution, so shards balance
    * even when ids are dense at one end — unlike hash-mod sharding,
    * which cannot give contiguous ranges, or manual bounds, which skew
    * when the id space has holes. */
  def writeTrainingShards(
      df: org.apache.spark.sql.DataFrame, idCol: String,
      nShards: Int, dir: String): Unit =
    df.repartitionByRange(nShards, col(idCol))
      .sortWithinPartitions(col(idCol))
      .write.mode(SaveMode.Overwrite).parquet(dir)
}

package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Partition values that hive-escape — spaces (written RAW on disk) and
  * colons (written as literal `%3A`) — must survive the whole commit-log
  * lifecycle: init, read, upsert, delete, manifest stats, and the
  * incremental view. The root failure this pins: `input_file_name()` /
  * `Path.toUri` spellings are URI-ENCODED while disk names are raw, and
  * one mixed comparison or a double decode corrupts the path
  * (`p=A B` → `p=A%20B` → read of a nonexistent file). The canonical
  * spelling everywhere is the RAW path ([[DataSkipping.rawPath]]).
  */
class EscapedPartitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("space- and colon-valued partitions: init, upsert, delete, statsAgg, view refresh") {
    val work = java.nio.file.Files.createTempDirectory("graft_escpart_").toString
    val base = s"$work/base"
    // "1-URGENT NOW" keeps a space raw on disk; "a:b" escapes to %3A
    Seq((1L, "1-URGENT NOW", 10L), (2L, "1-URGENT NOW", 20L),
        (3L, "a:b", 30L), (4L, "plain", 40L))
      .toDF("k", "p", "v")
      .write.partitionBy("p").parquet(base)
    CommitLog.init(spark, base, statsCols = Seq("v"))
    assert(CommitLog.read(spark, base).count() === 4L)

    // exact metadata-plane aggregate over the escaped layout
    val stats = CommitLog.statsAgg(spark, base, Seq("v")).head
    assert(stats.getAs[Long]("rows") === 4L)
    assert(stats.getAs[Long]("min_v") === 10L && stats.getAs[Long]("max_v") === 40L)

    // upsert INTO the spacey partition
    CommitLog.upsert(spark,
      Seq((1L, "1-URGENT NOW", 11L), (5L, "1-URGENT NOW", 50L)).toDF("k", "p", "v"),
      base, Seq("k"), "p")
    val after = CommitLog.read(spark, base)
    assert(after.count() === 5L)
    assert(after.filter(col("k") === 1L).select("v").as[Long].head === 11L)

    // delete FROM the colon partition (file-granular rewrite)
    CommitLog.delete(spark, base, col("p") === "a:b")
    assert(CommitLog.read(spark, base).filter(col("p") === "a:b").count() === 0L)
    assert(CommitLog.read(spark, base).count() === 4L)

    // incremental view over the escaped partition column stays exact
    val d = IncrementalView.Definition(base, s"$work/view", "p", Seq("p"),
      Seq(count(lit(1)).as("n"), sum("v").as("sv")))
    IncrementalView.refresh(spark, d)
    CommitLog.upsert(spark,
      Seq((2L, "1-URGENT NOW", 21L)).toDF("k", "p", "v"), base, Seq("k"), "p")
    val touched = IncrementalView.refresh(spark, d)
    assert(touched === Seq("1-URGENT NOW"))
    val got = IncrementalView.read(spark, d).select("p", "n", "sv")
      .collect().map(_.toString).sorted.toSeq
    val want = CommitLog.read(spark, base).groupBy("p")
      .agg(count(lit(1)).as("n"), sum("v").as("sv")).select("p", "n", "sv")
      .collect().map(_.toString).sorted.toSeq
    assert(got === want)
  }

  test("standalone sidecar skipping prunes on a spacey partitioned layout") {
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_escskip_")}/lake"
    spark.range(0, 1000).select(
        col("id").as("k"),
        when(col("id") < 500, "low band").otherwise("high band").as("p"))
      .repartitionByRange(4, col("k"))
      .write.partitionBy("p").parquet(dir)
    DataSkipping.buildManifest(spark, dir, Seq("k"))
    val (df, (read, total)) = DataSkipping.scanRange(spark, dir, "k", 0L, 99L)
    assert(df.count() === 100L)
    assert(read < total, s"pruning disengaged on escaped layout: $read/$total")
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[DataSkipping]]: a range query over a range-clustered lake must open
  * only the overlapping files; a stale manifest must degrade to a full
  * (correct) scan, never to a wrong answer.
  */
class DataSkippingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshLake(): String = {
    val dir = Files.createTempDirectory("graft_skip_").toString + "/lake"
    spark.range(0, 10000).select($"id", ($"id" % 97).as("v"))
      .repartitionByRange(10, $"id")
      .write.parquet(dir)
    DataSkipping.buildManifest(spark, dir, Seq("id"))
    dir
  }

  test("range scan reads only overlapping files and matches the full scan") {
    val dir = freshLake()
    val (pruned, (read, total)) = DataSkipping.scanRange(spark, dir, "id", 2000L, 2999L)
    assert(total == 10, s"expected 10 data files, saw $total")
    assert(read < total, s"no pruning happened: $read/$total")
    assert(read <= 3, s"range spans ~1 of 10 range-partitioned files: $read")
    val expected = spark.read.parquet(dir)
      .filter($"id" >= 2000L && $"id" <= 2999L)
      .agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
    val got = pruned.agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
    assert(got == expected)
    assert(got._1 == 1000L)
  }

  test("a scan outside every file's range returns empty with the schema") {
    val dir = freshLake()
    val (pruned, (read, _)) = DataSkipping.scanRange(spark, dir, "id", 50000L, 60000L)
    assert(read == 0)
    assert(pruned.columns.toSeq == Seq("id", "v"))
    assert(pruned.count() == 0L)
  }

  test("string zone maps prune a lexicographic range (scanBoxAny)") {
    val dir = Files.createTempDirectory("graft_skip_s_").toString + "/lake"
    // names cluster lexicographically across EXACTLY 10 files, one per
    // 1000-id slice, written explicitly — repartitionByRange's sampled
    // boundaries depend on cpu count / split layout and once produced a
    // 3-file straddle on a 32-core box (flaky-red round 10)
    (0 until 10).foreach { b =>
      spark.range(b * 1000L, (b + 1) * 1000L)
        .select($"id", concat(lit("user_"),
          format_string("%05d", $"id")).as("name"))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    CommitLog.init(spark, dir, statsCols = Seq("name"))
    val (pruned, (read, total)) = CommitLog.scanBoxAny(spark, dir,
      Seq(("name", "user_02000", "user_02999")))
    assert(total == 10)
    assert(read == 1, s"string range covers exactly 1 of 10 bounded files: $read/$total")
    assert(pruned.count() == 1000L)
    // correctness against the unpruned filter
    assert(pruned.agg(sum($"id")).as[Long].head() ==
      (2000L until 3000L).sum)
  }

  test("a stale manifest falls back to the full scan and stays correct") {
    val dir = freshLake()
    // a writer appended data the manifest has never seen
    spark.range(90000, 90100).select($"id", lit(0L).as("v"))
      .coalesce(1).write.mode("append").parquet(dir)
    val (df, (read, total)) = DataSkipping.scanRange(spark, dir, "id", 90000L, 99999L)
    assert(read == total, s"stale manifest must disable pruning: $read/$total")
    assert(df.count() == 100L, "fallback scan missed the appended rows")
  }

  test("missing manifest scans everything, still correct") {
    val dir = Files.createTempDirectory("graft_skip_nm_").toString + "/lake"
    spark.range(0, 100).select($"id", $"id".as("v")).write.parquet(dir)
    val (df, (read, total)) = DataSkipping.scanRange(spark, dir, "id", 10L, 19L)
    assert(read == total)
    assert(df.count() == 10L)
  }

  test("z-order clustering lets a 2-D box prune on both columns at once") {
    val dir = Files.createTempDirectory("graft_skip_z_").toString + "/lake"
    // 256x256 grid, clustered by the Morton interleave of (x, y): each of
    // the 16 files then covers a compact square-ish region of the plane
    val grid = spark.range(0, 65536).select(
      ($"id" % 256).as("x"), expr("id div 256").as("y"))
    grid.withColumn("z", graft.ops.GeoOps.zorderKey($"x", $"y"))
      .repartitionByRange(16, $"z")
      .sortWithinPartitions($"z")
      .drop("z")
      .write.parquet(dir)
    DataSkipping.buildManifest(spark, dir, Seq("x", "y"))
    val (pruned, (read, total)) = DataSkipping.scanBox(spark, dir,
      Seq(("x", 10L, 50L), ("y", 10L, 50L)))
    assert(total == 16)
    // a 41x41 box is 2.6% of the plane; z-order files are ~64x64 blocks,
    // so the box touches at most a 2x2 block neighbourhood
    assert(read <= 4, s"z-order pruning too weak: opened $read/$total files")
    assert(pruned.count() == 41L * 41L)
    val expected = spark.read.parquet(dir)
      .filter($"x".between(10, 50) && $"y".between(10, 50)).count()
    assert(pruned.count() == expected)
  }

  test("pruning engages on a hive-partitioned lake (nested directories)") {
    val dir = Files.createTempDirectory("graft_skip_part_").toString + "/lake"
    // 3 partitions × range-clustered ids within — the upsert lake's shape
    spark.range(0, 3000)
      .select(concat(lit("d"), ($"id" / 1000).cast("long")).as("pd"),
        $"id", ($"id" % 97).as("v"))
      .repartitionByRange(6, $"id")
      .write.partitionBy("pd").parquet(dir)
    DataSkipping.buildManifest(spark, dir, Seq("id"))
    val (pruned, (read, total)) = DataSkipping.scanRange(spark, dir, "id", 100L, 399L)
    assert(total >= 6, s"recursive listing missed nested files: $total")
    assert(read < total, s"no pruning on a partitioned layout: $read/$total")
    assert(pruned.count() == 300L)
    // partition columns survive the survivor file-list read (basePath)
    assert(pruned.columns.contains("pd"))
    assert(pruned.select($"pd").distinct().as[String].collect().toSeq == Seq("d0"))
  }

  test("partitioned + z-ordered lake: 2-D box prunes inside nested dirs") {
    val dir = Files.createTempDirectory("graft_skip_pz_").toString + "/lake"
    // partition by a coarse region, z-order (x, y) within each region
    val grid = spark.range(0, 65536).select(
      ($"id" % 256).as("x"), expr("id div 256").as("y"))
    grid.withColumn("region", concat(lit("r"), expr("x div 128")))
      .withColumn("z", graft.ops.GeoOps.zorderKey($"x", $"y"))
      .repartitionByRange(16, $"region", $"z")
      .sortWithinPartitions($"z")
      .drop("z")
      .write.partitionBy("region").parquet(dir)
    DataSkipping.buildManifest(spark, dir, Seq("x", "y"))
    val (pruned, (read, total)) = DataSkipping.scanBox(spark, dir,
      Seq(("x", 10L, 50L), ("y", 10L, 50L)))
    assert(total >= 8, s"recursive listing missed nested files: $total")
    assert(read < total, s"no pruning on the partitioned z-ordered lake: $read/$total")
    assert(pruned.count() == 41L * 41L)
  }

  test("refreshManifest rescans only new files and re-enables pruning") {
    val dir = freshLake()
    // out-of-band append staled the manifest…
    spark.range(90000, 90100).select($"id", lit(0L).as("v"))
      .coalesce(1).write.mode("append").parquet(dir)
    val (_, (staleRead, staleTotal)) = DataSkipping.scanRange(spark, dir, "id", 0L, 999L)
    assert(staleRead == staleTotal, "append must stale the manifest")
    // …refresh picks up the one new file and pruning engages again
    DataSkipping.refreshManifest(spark, dir)
    val (pruned, (read, total)) = DataSkipping.scanRange(spark, dir, "id", 0L, 999L)
    assert(total == 11 && read < total, s"refresh did not re-enable pruning: $read/$total")
    assert(pruned.count() == 1000L)
    // the appended slice is findable through the refreshed manifest too
    val (hi, (hiRead, _)) = DataSkipping.scanRange(spark, dir, "id", 90000L, 99999L)
    assert(hiRead == 1 && hi.count() == 100L)
  }

  test("a bound on a column missing from the manifest falls back, correct") {
    val dir = freshLake()
    val (df, (read, total)) = DataSkipping.scanBox(spark, dir,
      Seq(("id", 0L, 999L), ("v", 0L, 10L)))
    assert(read == total, "manifest lacks v stats - pruning must disable")
    val expected = spark.read.parquet(dir)
      .filter($"id".between(0, 999) && $"v".between(0, 10)).count()
    assert(df.count() == expected && expected > 0)
  }
}

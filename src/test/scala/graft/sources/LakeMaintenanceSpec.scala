package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LakeMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compact collapses small files, preserves rows, swaps atomically") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    // 10 appends of 100 rows → many small files
    (0 until 10).foreach { i =>
      (i * 100 until (i + 1) * 100).toDF("v")
        .repartition(4).write.mode("append").parquet(dir)
    }
    val stats = LakeMaintenance.compact(spark, dir, targetPartitions = 2)
    assert(stats.rows == 1000)
    assert(stats.filesBefore >= 20 && stats.filesAfter <= 2,
      s"unexpected compaction: $stats")
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum($"v")).as[Long].head() ==
      (0 until 1000).sum.toLong)
    assert(!new java.io.File(dir + "__old").exists())
    assert(!new java.io.File(dir + "__compacting").exists())
  }

  test("training shards: disjoint contiguous id ranges, sorted within shard") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("shards").toString + "/corpus"
    val docs = (0L until 997L).map(i => (i * 7 % 1000, s"doc$i")).toDF("id", "text")
    LakeMaintenance.writeTrainingShards(docs, "id", nShards = 4, dir = dir)
    val files = spark.read.parquet(dir)
      .select(input_file_name().as("f"), $"id")
    // every row lands somewhere, 4 shards, ranges don't interleave
    assert(files.count() == 997)
    val ranges = files.groupBy($"f")
      .agg(min($"id").as("lo"), max($"id").as("hi"))
      .select($"lo", $"hi").as[(Long, Long)].collect().sortBy(_._1)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, "shard ranges overlap")
      case _ =>
    }
  }
}

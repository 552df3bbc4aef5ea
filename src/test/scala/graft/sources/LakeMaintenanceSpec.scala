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
}

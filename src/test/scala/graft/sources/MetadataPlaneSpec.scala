package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.NativeBloom

/** The commit log's metadata plane: [[CommitLog.statsAgg]] must answer
  * exact aggregates with ZERO data files opened (proved by deleting the
  * data files and asking again), and [[CommitLog.scanPoint]] must prune
  * through the committed per-file Bloom filters — negatives definitive,
  * false positives bounded. Plus the [[NativeBloom]] aggregate/probe
  * semantics themselves.
  */
class MetadataPlaneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---------------------------------------------------------- NativeBloom
  test("bloom agg + probe: members always hit, non-members mostly miss, across partitions") {
    val df = spark.range(0, 2000).toDF("v").repartition(7)
    val bytes = df.agg(NativeBloom.bloomAgg(col("v"), 4096).as("b"))
      .head.getAs[Array[Byte]](0)
    val probes = spark.range(0, 4000).toDF("p")
      .select(col("p"),
        NativeBloom.bloomMightContain(lit(bytes), col("p")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // no false negatives, ever (the merge across 7 partitions included)
    assert((0L until 2000L).forall(probes(_)), "bloom dropped a member")
    // false positives bounded: 3% fpp at half capacity — allow 5x slack
    val fp = (2000L until 4000L).count(probes(_))
    assert(fp <= 300, s"false-positive rate blew up: $fp/2000")
  }

  test("bloom: nulls are not inserted; null probe/filter yield null") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("v")
    val bytes = df.agg(NativeBloom.bloomAgg(col("v"), 64).as("b"))
      .head.getAs[Array[Byte]](0)
    val out = Seq(Some(1L), Some(99L), None).toDF("p")
      .select(NativeBloom.bloomMightContain(lit(bytes), col("p")).as("hit"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(out.toSeq === Seq(Some(true), Some(false), None))
  }

  test("bloom over strings agrees between agg and probe") {
    val df = Seq("alpha", "beta", "gamma").toDF("s")
    val bytes = df.agg(NativeBloom.bloomAgg(col("s"), 64).as("b"))
      .head.getAs[Array[Byte]](0)
    val hits = Seq("alpha", "delta").toDF("p")
      .select(NativeBloom.bloomMightContain(lit(bytes), col("p")))
      .as[Boolean].collect().toSeq
    assert(hits === Seq(true, false))
  }

  // --------------------------------------------- statsAgg: zero data files
  test("statsAgg answers exactly, and still answers after the data files are deleted") {
    val dir = s"${tmp("graft_statsagg_")}/lake"
    Seq((1L, Some(10.0)), (2L, None), (3L, Some(30.0)), (4L, Some(5.5)))
      .toDF("k", "x").repartition(3)
      .write.parquet(dir)
    CommitLog.init(spark, dir, statsCols = Seq("k", "x"))
    def check(): Unit = {
      val r = CommitLog.statsAgg(spark, dir, Seq("k", "x")).head
      assert(r.getAs[Long]("rows") === 4L)
      assert(r.getAs[Long]("min_k") === 1L && r.getAs[Long]("max_k") === 4L)
      assert(r.getAs[Long]("count_k") === 4L)
      assert(r.getAs[Double]("min_x") === 5.5 && r.getAs[Double]("max_x") === 30.0)
      assert(r.getAs[Long]("count_x") === 3L) // the null does not count
    }
    check()
    // the brutal proof: drop every DATA file; the metadata plane answers,
    // the data plane cannot
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommitLog.latest(spark, dir).get.files.foreach { rel =>
      assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$rel"), false))
    }
    check()
    intercept[Exception] { CommitLog.read(spark, dir).count() }
  }

  test("statsAggByPartition ≡ full-scan GROUP BY, answers with the data files gone, and tracks upserts") {
    val dir = s"${tmp("graft_statsgb_")}/lake"
    spark.range(0, 1200)
      .select($"id".as("k"), when($"id" % 11 === 0, lit(null))
          .otherwise($"id" % 97).cast("long").as("x"),
        concat(lit("g"), ($"id" % 3).cast("long")).as("pd"))
      .repartition(4)
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir, statsCols = Seq("k", "x"))
    // post-upsert freshness: a second commit extends one partition
    CommitLog.upsert(spark,
      spark.range(5000, 5100).select($"id".as("k"), lit(7L).as("x"),
        lit("g0").as("pd")),
      dir, Seq("k"), "pd")
    def grouped(): Map[String, (Long, Long, Long, Long)] =
      CommitLog.statsAggByPartition(spark, dir, Seq("k", "x"))
        .select($"pd", $"rows", $"min_k", $"max_k", $"count_x")
        .as[(String, Long, Long, Long, Long)]
        .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val expected = CommitLog.read(spark, dir)
      .groupBy($"pd").agg(count(lit(1)).as("n"), min($"k").as("mn"),
        max($"k").as("mx"), count($"x").as("cx"))
      .as[(String, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(grouped() == expected)
    // drop every data file: the metadata plane still answers per group
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommitLog.latest(spark, dir).get.files.foreach { rel =>
      assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$rel"), false))
    }
    assert(grouped() == expected)
  }

  test("statsAggByPartition recovers the null partition and refuses unpartitioned tables") {
    val dir = s"${tmp("graft_statsgb2_")}/lake"
    Seq((1L, Some("a")), (2L, None), (3L, Some("a")))
      .toDF("k", "pd").write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir, statsCols = Seq("k"))
    val rows = CommitLog.statsAggByPartition(spark, dir, Seq("k"))
      .select($"pd", $"rows").collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(rows == Map(Some("a") -> 2L, None -> 1L))
    val flat = s"${tmp("graft_statsgb3_")}/lake"
    Seq((1L, 2L)).toDF("k", "x").write.parquet(flat)
    CommitLog.init(spark, flat, statsCols = Seq("k"))
    intercept[IllegalArgumentException] {
      CommitLog.statsAggByPartition(spark, flat, Seq("k"))
    }
  }

  test("distinctAgg answers count(distinct) exactly from the manifest, per partition, through upserts, with data files gone") {
    val dir = s"${tmp("graft_distinct_")}/lake"
    spark.range(0, 3000)
      .select($"id".as("k"), ($"id" % 137).as("u"),
        concat(lit("g"), ($"id" % 3).cast("long")).as("pd"))
      .repartition(4)
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir, thetaCols = Seq("k", "u"), thetaLgK = 14)
    // freshness: a second commit adds new keys and new u values to g0
    CommitLog.upsert(spark,
      spark.range(9000, 9100).select($"id".as("k"), ($"id" % 211).as("u"),
        lit("g0").as("pd")),
      dir, Seq("k"), "pd")
    val expectGlobal = CommitLog.read(spark, dir)
      .agg(countDistinct($"k").as("dk"), countDistinct($"u").as("du"))
      .as[(Long, Long)].head()
    val expectGrouped = CommitLog.read(spark, dir)
      .groupBy($"pd").agg(countDistinct($"k").as("dk"),
        countDistinct($"u").as("du"))
      .as[(String, Long, Long)].collect().toSet
    def global() = CommitLog.distinctAgg(spark, dir, Seq("k", "u"))
      .as[(Long, Long)].head()
    def grouped() = CommitLog.distinctAggByPartition(spark, dir, Seq("k", "u"))
      .select($"pd", $"distinct_k", $"distinct_u")
      .as[(String, Long, Long)].collect().toSet
    assert(global() == expectGlobal)
    assert(grouped() == expectGrouped)
    // the brutal proof again: the metadata plane answers without data
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommitLog.latest(spark, dir).get.files.foreach { rel =>
      assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$rel"), false))
    }
    assert(global() == expectGlobal)
    assert(grouped() == expectGrouped)
    intercept[IllegalArgumentException] {
      CommitLog.distinctAgg(spark, dir, Seq("pd"))
    }
  }

  test("statsAgg refuses untracked columns") {
    val dir = s"${tmp("graft_statsagg2_")}/lake"
    Seq((1L, 2L)).toDF("k", "x").write.parquet(dir)
    CommitLog.init(spark, dir, statsCols = Seq("k"))
    intercept[IllegalArgumentException] {
      CommitLog.statsAgg(spark, dir, Seq("x"))
    }
  }

  // -------------------------------------------- scanPoint: bloom pruning
  test("scanPoint prunes to the files that hold the value; result exact; upsert maintains blooms") {
    val dir = s"${tmp("graft_scanpoint_")}/lake"
    // 1000 keys hashed over 10 tasks × 4 hive partitions (a NESTED
    // layout, like a real lake): each key lands in exactly one file, and
    // k is uncorrelated with any zone-mappable clustering
    spark.range(0, 5000).select(
        (col("id") % 1000).as("k"), (col("id") * 7).as("v"),
        ((col("id") % 1000) % 4).as("p"))
      .repartition(10, col("k"))
      .write.partitionBy("p").parquet(dir)
    CommitLog.init(spark, dir, statsCols = Seq("v"),
      bloomCols = Seq("k"), bloomExpect = 4096)
    val (hits, (read, total)) = CommitLog.scanPoint(spark, dir, "k", 123L)
    assert(total >= 20, s"expected a many-file nested lake, got $total")
    assert(read <= 4, s"bloom pruning read $read of $total files")
    assert(hits.count() === 5L)
    assert(hits.agg(sum("v")).as[Long].head ===
      (0L until 5000L).filter(_ % 1000 == 123).map(_ * 7).sum)
    // a value no file holds: definitive negatives → typically zero files
    val (miss, (readMiss, _)) = CommitLog.scanPoint(spark, dir, "k", 5555L)
    assert(miss.count() === 0L)
    assert(readMiss <= 2, s"absent key still read $readMiss files")
    // an upsert commits fresh per-file blooms for the files it adds —
    // the new key is findable, pruning still engages
    CommitLog.upsert(spark,
      Seq((7777L, 1L, 1), (123L, -1L, 3)).toDF("k", "v", "p")
        .withColumn("p", col("p").cast("int")),
      dir, Seq("k"), "p")
    val (afterHits, (readAfter, totalAfter)) =
      CommitLog.scanPoint(spark, dir, "k", 7777L)
    assert(afterHits.count() === 1L)
    assert(readAfter < totalAfter, "pruning disengaged after upsert")
    // the upserted key's pre-image was replaced: merge-by-key semantics
    val (k123, _) = CommitLog.scanPoint(spark, dir, "k", 123L)
    assert(k123.agg(sum("v")).as[Long].head === -1L)
  }

  test("scanPoint refuses a column with no committed bloom") {
    val dir = s"${tmp("graft_scanpoint2_")}/lake"
    Seq((1L, 2L)).toDF("k", "v").write.parquet(dir)
    CommitLog.init(spark, dir, statsCols = Seq("k"))
    intercept[IllegalArgumentException] {
      CommitLog.scanPoint(spark, dir, "k", 1L)
    }
  }
}

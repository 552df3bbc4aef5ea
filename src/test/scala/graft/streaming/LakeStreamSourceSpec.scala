package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.CommitLog

/** [[LakeStreamSource]]: the streaming table read must deliver the
  * initial snapshot then each append exactly once (offsets = commit
  * versions), stay silent across compactions, abort loudly on change
  * commits unless skipChangeCommits, and be reachable by catalog NAME
  * through both `readStream.table` and the follower verbs. */
class LakeStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  private def sinkName(): String = { n += 1; s"lake_stream_sink_$n" }

  private def work(): String = {
    val d = Files.createTempDirectory("graft_stream_src_")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def seed(dir: String, rows: Long = 30): Unit = {
    spark.range(0, rows).select($"id".as("k"), ($"id" % 7).as("v"),
      concat(lit("p"), ($"id" % 3)).as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
  }

  private def sinkRows(name: String): Set[(Long, Long, String)] =
    spark.table(name).select($"k", $"v", $"pd")
      .as[(Long, Long, String)].collect().toSet

  test("initial snapshot then appends, exactly once; compaction is silent") {
    val w = work(); val dir = s"$w/lake"
    seed(dir)
    val sink = sinkName()
    val q = spark.readStream.format("graft-lake").load(dir)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", s"$w/chk").start()
    try {
      q.processAllAvailable()
      assert(sinkRows(sink) == CommitLog.read(spark, dir)
        .select($"k", $"v", $"pd").as[(Long, Long, String)].collect().toSet,
        "first batch must be the full snapshot at subscription")
      CommitLog.append(spark,
        spark.range(100, 110).select($"id".as("k"), lit(1L).as("v"),
          lit("p0").as("pd")), dir)
      q.processAllAvailable()
      assert(sinkRows(sink).count(_._1 >= 100) == 10,
        "appended rows must arrive exactly once")
      assert(sinkRows(sink).size == 40)
      // compaction rewrites files but moves no rows — nothing delivered
      CommitLog.compact(spark, dir, targetPartitions = 2)
      q.processAllAvailable()
      assert(sinkRows(sink).size == 40, "compaction must deliver nothing")
    } finally q.stop()
  }

  test("readStream.table on a graft catalog name (v1 fallback through " +
    "the capability-less v2 table)") {
    val w = work()
    spark.conf.set("spark.sql.catalog.gstream",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstream.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gstream.db")
    spark.sql("CREATE TABLE gstream.db.ev (k BIGINT, v BIGINT, pd STRING) " +
      "PARTITIONED BY (pd)")
    spark.sql("INSERT INTO gstream.db.ev " +
      "SELECT id, id % 5, concat('p', id % 2) FROM range(0, 20)")
    val sink = sinkName()
    val q = spark.readStream.table("gstream.db.ev")
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", s"$w/chk_tbl").start()
    try {
      q.processAllAvailable()
      assert(sinkRows(sink).size == 20, "snapshot through the table name")
      spark.sql("INSERT INTO gstream.db.ev VALUES (500, 1, 'p0'), " +
        "(501, 2, 'p1')")
      q.processAllAvailable()
      assert(sinkRows(sink).size == 22 &&
        sinkRows(sink).exists(_._1 == 500L),
        "appends through the catalog write path must stream out")
    } finally q.stop()
    // the follower verbs accept the same name
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val f = LakeFollow.followChanges(spark, "gstream.db.ev", s"$w/chk_f") {
      (df, _, _) => got.add(df.count()); ()
    }
    try {
      spark.sql("INSERT INTO gstream.db.ev VALUES (600, 3, 'p0')")
      val t0 = System.currentTimeMillis()
      while (got.isEmpty && System.currentTimeMillis() - t0 < 30000)
        Thread.sleep(100)
    } finally f.stop()
    assert(!got.isEmpty, "name-addressed followChanges saw no changes")
  }

  test("startingVersion=latest skips the snapshot; change commits abort " +
    "unless skipChangeCommits") {
    val w = work(); val dir = s"$w/lake"
    seed(dir)
    val sink = sinkName()
    val q = spark.readStream.format("graft-lake")
      .option("startingVersion", "latest").load(dir)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", s"$w/chk").start()
    try {
      q.processAllAvailable()
      assert(sinkRows(sink).isEmpty, "latest: no initial snapshot")
      CommitLog.append(spark,
        spark.range(200, 203).select($"id".as("k"), lit(2L).as("v"),
          lit("p1").as("pd")), dir)
      q.processAllAvailable()
      assert(sinkRows(sink).map(_._1) == Set(200L, 201L, 202L))
      // a delete rewrites files: the stream must fail loudly
      CommitLog.delete(spark, dir, $"k" < 3L)
      val e = intercept[StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("non-append") ||
        Option(e.getCause).exists(_.getMessage.contains("non-append")),
        s"stream must name the non-append commit: ${e.getMessage}")
    } finally q.stop()
    // skipChangeCommits: same range streams on, appends only
    val sink2 = sinkName()
    val q2 = spark.readStream.format("graft-lake")
      .option("startingVersion", "1")
      .option("skipChangeCommits", "true").load(dir)
      .writeStream.format("memory").queryName(sink2)
      .option("checkpointLocation", s"$w/chk2").start()
    try {
      q2.processAllAvailable()
      assert(sinkRows(sink2).map(_._1) == Set(200L, 201L, 202L),
        "skipChangeCommits must deliver the appends and skip the delete")
    } finally q2.stop()
  }

  test("maxFilesPerTrigger chunks the initial snapshot and backlog " +
    "into bounded micro-batches, delivering every row exactly once") {
    val w = work(); val dir = s"$w/lake"
    // 6 files: 3 partitions x 2 files
    spark.range(0, 60).repartition(2)
      .select($"id".as("k"), ($"id" % 7).as("v"),
        concat(lit("p"), ($"id" % 3)).as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
    val nFiles = CommitLog.latest(spark, dir).get.files.size
    assert(nFiles >= 6, s"fixture wants >=6 files, got $nFiles")
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
    val q = spark.readStream.format("graft-lake")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream
      .option("checkpointLocation", s"$w/chk")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.select($"k").as[Long].collect().toSet); ()
      }.start()
    try {
      q.processAllAvailable()
      val snap = batches.asScala.toSeq
      assert(snap.size >= nFiles / 2,
        s"snapshot must arrive in >=${nFiles / 2} bounded batches, " +
          s"got ${snap.size}")
      assert(snap.map(_.size).sum == 60 &&
        snap.flatten.toSet == (0L until 60L).toSet,
        "chunking must deliver every snapshot row exactly once")
      // backlog: three appends land while the stream is running —
      // still bounded, still exactly once
      batches.clear()
      (0 until 3).foreach { b =>
        CommitLog.append(spark,
          spark.range(100L + b * 10, 110L + b * 10).repartition(2)
            .select($"id".as("k"), lit(1L).as("v"), lit("p0").as("pd")),
          dir)
      }
      q.processAllAvailable()
      val tail = batches.asScala.toSeq
      assert(tail.map(_.size).sum == 30 &&
        tail.flatten.toSet == (100L until 130L).toSet,
        "backlog appends must drain exactly once")
      assert(tail.size >= 3,
        s"6 backlog files at 2/trigger must take >=3 batches, got ${tail.size}")
    } finally q.stop()
    // restart mid-stream state: more appends while down, then resume
    CommitLog.append(spark,
      spark.range(200, 210).repartition(2).select($"id".as("k"),
        lit(2L).as("v"), lit("p1").as("pd")), dir)
    batches.clear()
    val q2 = spark.readStream.format("graft-lake")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream
      .option("checkpointLocation", s"$w/chk")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.select($"k").as[Long].collect().toSet); ()
      }.start()
    try {
      q2.processAllAvailable()
      assert(batches.asScala.flatten.toSet == (200L until 210L).toSet,
        "restart must deliver exactly the offline gap, chunked")
    } finally q2.stop()
  }

  test("mid-stream schema evolution fails the stream loudly; a " +
    "restarted stream picks up the new schema") {
    val w = work(); val dir = s"$w/lake"
    seed(dir, rows = 10)
    val sink = sinkName()
    val q = spark.readStream.format("graft-lake").load(dir)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", s"$w/chk").start()
    try {
      q.processAllAvailable()
      // additive evolution through an append: new column `note`
      CommitLog.append(spark,
        spark.range(50, 52).select($"id".as("k"), lit(9L).as("v"),
          lit("x").as("note"), lit("p0").as("pd"))
          .select($"k", $"v", $"pd", $"note"), dir)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getMessage.contains("schema changed") ||
        Option(e.getCause).exists(_.getMessage.contains("schema changed")),
        s"must name the schema change: ${e.getMessage}")
    } finally q.stop()
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q2 = spark.readStream.format("graft-lake")
      .option("startingVersion", "1").load(dir)
      .writeStream
      .option("checkpointLocation", s"$w/chk2")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.add(df.columns.length); ()
      }.start()
    try {
      q2.processAllAvailable()
      assert(got.asScala.forall(_ == 4),
        "restarted stream reads under the evolved 4-column schema")
    } finally q2.stop()
  }

  test("readChangeFeed=true streams the row-level CDC feed: labeled " +
    "inserts, deletes, and update pairs per version range") {
    val w = work(); val dir = s"$w/lake"
    seed(dir, rows = 20)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, Long)]()
    val q = spark.readStream.format("graft-lake")
      .option("readChangeFeed", "true")
      .option("keyColumns", "k").load(dir)
      .writeStream
      .option("checkpointLocation", s"$w/chk")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select($"_change_type", $"k", $"v")
          .as[(String, Long, Long)].collect().foreach(got.add); ()
      }.start()
    try {
      q.processAllAvailable()
      assert(got.isEmpty, "CDC starts at the subscription — no snapshot")
      // one upsert: k=3 updated (v 3 -> 99), k=500 inserted
      CommitLog.upsert(spark,
        Seq((3L, 99L, "p0"), (500L, 1L, "p2")).toDF("k", "v", "pd"),
        dir, Seq("k"), "pd")
      CommitLog.delete(spark, dir, $"k" === 7L)
      q.processAllAvailable()
      val rows = got.asScala.toSet
      assert(rows.contains(("update_preimage", 3L, 3L)) &&
        rows.contains(("update_postimage", 3L, 99L)),
        s"update pair expected in $rows")
      assert(rows.contains(("insert", 500L, 1L)))
      assert(rows.contains(("delete", 7L, 0L)))
      assert(!rows.exists(r => r._2 != 3L && r._2 != 500L && r._2 != 7L),
        "untouched rows must not appear in the feed")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog in bounded batches " +
    "then stops — the batch-incremental pipeline shape") {
    val w = work(); val dir = s"$w/lake"
    spark.range(0, 40).repartition(2)
      .select($"id".as("k"), lit(0L).as("v"),
        concat(lit("p"), ($"id" % 2)).as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
    CommitLog.append(spark, spark.range(700, 705).select($"id".as("k"),
      lit(7L).as("v"), lit("p0").as("pd")), dir)
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
    val q = spark.readStream.format("graft-lake")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream
      .option("checkpointLocation", s"$w/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.select($"k").as[Long].collect().toSet); ()
      }.start()
    assert(q.awaitTermination(120000),
      "AvailableNow must drain and terminate on its own")
    val all = batches.asScala.toSeq
    assert(all.flatten.toSet ==
      ((0L until 40L) ++ (700L until 705L)).toSet,
      "AvailableNow must deliver the whole backlog exactly once")
    assert(all.size >= 2, "and still in bounded batches")
    // a second AvailableNow run with nothing new terminates empty
    batches.clear()
    val q2 = spark.readStream.format("graft-lake")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream
      .option("checkpointLocation", s"$w/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.select($"k").as[Long].collect().toSet); ()
      }.start()
    assert(q2.awaitTermination(120000))
    assert(batches.asScala.flatten.isEmpty,
      "an already-drained AvailableNow run must deliver nothing")
  }

  test("property: random commit shapes, chunk sizes, and a mid-run " +
    "restart still deliver every row exactly once") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val w = work(); val dir = s"$w/lake"
      val seedRows = 10 + rnd.nextInt(20)
      spark.range(0, seedRows).repartition(1 + rnd.nextInt(3))
        .select($"id".as("k"), lit(0L).as("v"),
          concat(lit("p"), ($"id" % 2)).as("pd"))
        .write.partitionBy("pd").parquet(dir)
      CommitLog.init(spark, dir)
      var next = 1000L
      def appendSome(): Seq[Long] = {
        val n = 3 + rnd.nextInt(8)
        val ks = (next until next + n); next += n
        CommitLog.append(spark,
          spark.createDataset(ks).toDF("k")
            .repartition(1 + rnd.nextInt(3))
            .select($"k", lit(1L).as("v"),
              concat(lit("p"), ($"k" % 2)).as("pd")), dir)
        ks
      }
      val preRestart = (0 until 1 + rnd.nextInt(2)).flatMap(_ => appendSome())
      val maxFiles = 1 + rnd.nextInt(4)
      val delivered =
        new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
      def run() = spark.readStream.format("graft-lake")
        .option("maxFilesPerTrigger", maxFiles.toString).load(dir)
        .writeStream.option("checkpointLocation", s"$w/chk")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          delivered.add(df.select($"k").as[Long].collect().toSeq); ()
        }.start()
      val q1 = run()
      try q1.processAllAvailable() finally q1.stop()
      val postRestart = (0 until 1 + rnd.nextInt(2)).flatMap(_ => appendSome())
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()
      val all = delivered.asScala.flatten.toSeq
      val expect = (0L until seedRows) ++ preRestart ++ postRestart
      assert(all.size == expect.size,
        s"trial $trial (maxFiles=$maxFiles): duplicates or losses — " +
          s"delivered ${all.size} of ${expect.size}")
      assert(all.toSet == expect.toSet,
        s"trial $trial (maxFiles=$maxFiles): wrong rows")
    }
  }

  test("a follower that fell behind a vacuum fails with the recovery " +
    "path spelled out") {
    val w = work(); val dir = s"$w/lake"
    seed(dir, rows = 10)
    (0 until 3).foreach { b =>
      CommitLog.append(spark, spark.range(b * 10, b * 10 + 5)
        .select(($"id" + 1000).as("k"), lit(1L).as("v"),
          lit("p0").as("pd")), dir)
    }
    CommitLog.vacuum(spark, dir, keepLast = 1)
    val q = spark.readStream.format("graft-lake")
      .option("startingVersion", "1").load(dir)
      .writeStream.option("checkpointLocation", s"$w/chk")
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val e = intercept[StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("vacuumed under") &&
      m.contains("NEW checkpoint")),
      s"recovery guidance expected, got: ${msgs(e)}")
  }

  test("restart resumes from the checkpointed version offset") {
    val w = work(); val dir = s"$w/lake"
    seed(dir, rows = 10)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("graft-lake").load(dir)
        .writeStream
        .option("checkpointLocation", s"$w/chk")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got.add(df.select($"k").as[Long].collect().toSet); ()
        }.start()
    val q = run()
    try { q.processAllAvailable() } finally q.stop()
    assert(got.size == 1 && got.peek().size == 10, "snapshot batch first")
    got.clear()
    // commits landing while no stream runs
    CommitLog.append(spark,
      spark.range(300, 305).select($"id".as("k"), lit(3L).as("v"),
        lit("p2").as("pd")), dir)
    val q2 = run()
    try {
      q2.processAllAvailable()
      assert(got.asScala.flatten.toSet ==
        Set(300L, 301L, 302L, 303L, 304L),
        "restart must resume from the checkpoint, not re-snapshot")
    } finally q2.stop()
  }
}

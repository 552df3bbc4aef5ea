package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.CommitLog

/** The RESTART EDGES of the streaming table read — the shapes a crash,
  * a vacuum, or schema drift puts a real follower in:
  *
  *  - crash-replay of an UNCOMMITTED first batch (WAL'd offset, no
  *    commit) while the table advanced — the engine calls
  *    `getBatch(None, loggedEnd)` and the walk origin must come from
  *    the offset, not a freshly computed latest (which would silently
  *    skip the initial snapshot / the logged change range);
  *  - a follower whose next owed version is the oldest RETAINED version
  *    after a vacuum — must fail with the recovery path spelled out,
  *    never re-deliver the whole table as one "append";
  *  - declared column order ≠ scan order (partition column mid-schema)
  *    and empty micro-batches — same columns, different order, not
  *    schema evolution;
  *  - `followAdditiveSchema`: ADD COLUMNS keeps the stream running,
  *    non-additive changes still abort;
  *  - `startingTimestamp`: mid-history timestamp delivers exactly the
  *    versions after it. */
class LakeStreamRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def work(): String = {
    val d = Files.createTempDirectory("graft_stream_rec_")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def seed(dir: String, rows: Long = 10): Unit = {
    spark.range(0, rows).select($"id".as("k"), ($"id" % 7).as("v"),
      concat(lit("p"), ($"id" % 2)).as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
  }

  /** Simulate a crash between the offset WAL and the batch commit:
    * delete `commits/<latest>` from the checkpoint, keeping
    * `offsets/<latest>` — on restart the engine replays that batch with
    * `start = None` (batch 0) or the prior offset. */
  private def dropLastCommit(chk: String): Unit = {
    val dir = new java.io.File(s"$chk/commits")
    val fs = Option(dir.listFiles).getOrElse(Array.empty)
      .filter(_.getName.forall(_.isDigit))
    assert(fs.nonEmpty, s"no commit files under $chk/commits")
    val last = fs.maxBy(_.getName.toLong)
    val crc = new java.io.File(dir, s".${last.getName}.crc")
    assert(last.delete(), s"could not delete ${last.getPath}")
    if (crc.exists) crc.delete()
  }

  test("crash-replay of an uncommitted FIRST batch after the table " +
    "advanced still delivers the initial snapshot (append source)") {
    val w = work(); val dir = s"$w/lake"
    seed(dir, rows = 10)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
    def run() = spark.readStream.format("graft-lake").load(dir)
      .writeStream.option("checkpointLocation", s"$w/chk")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.add(df.select($"k").as[Long].collect().toSet); ()
      }.start()
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    assert(got.asScala.flatten.toSet == (0L until 10L).toSet)
    // crash between WAL and commit of batch 0; the table moves on
    dropLastCommit(s"$w/chk")
    CommitLog.append(spark, spark.range(100, 105).select($"id".as("k"),
      lit(1L).as("v"), lit("p0").as("pd")), dir)
    got.clear()
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    val all = got.asScala.flatten.toSeq
    assert(all.size == 15 &&
      all.toSet == ((0L until 10L) ++ (100L until 105L)).toSet,
      s"replayed batch 0 must re-deliver the snapshot AND the gap " +
        s"append must follow — got ${all.sorted}")
  }

  test("crash-replay of an uncommitted CDC first batch after the table " +
    "advanced still delivers the logged change range") {
    val w = work(); val dir = s"$w/lake"
    seed(dir, rows = 10)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long)]()
    def run() = spark.readStream.format("graft-lake")
      .option("readChangeFeed", "true").option("keyColumns", "k").load(dir)
      .writeStream.option("checkpointLocation", s"$w/chk")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select($"_change_type", $"k").as[(String, Long)]
          .collect().foreach(got.add); ()
      }.start()
    val q1 = run()
    try {
      q1.processAllAvailable() // subscription base = current latest
      CommitLog.append(spark, Seq((500L, 1L, "p0")).toDF("k", "v", "pd"),
        dir)
      q1.processAllAvailable()
    } finally q1.stop()
    assert(got.asScala.toSet == Set(("insert", 500L)))
    // crash between WAL and commit of the batch carrying k=500's
    // insert... actually of the LAST batch; the table then advances
    dropLastCommit(s"$w/chk")
    CommitLog.append(spark, Seq((600L, 2L, "p1")).toDF("k", "v", "pd"),
      dir)
    got.clear()
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    val rows = got.asScala.toList
    assert(rows.count(_ == ("insert", 500L)) == 1 &&
      rows.count(_ == ("insert", 600L)) == 1 && rows.size == 2,
      s"replay must cover exactly the logged range then the gap — $rows")
  }

  test("a follower whose next owed version is the oldest retained " +
    "version after a vacuum fails loudly instead of re-delivering " +
    "the whole table") {
    val w = work(); val dir = s"$w/lake"
    seed(dir, rows = 10) // v1
    CommitLog.append(spark, spark.range(100, 105).select($"id".as("k"),
      lit(1L).as("v"), lit("p0").as("pd")), dir) // v2
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
    def run() = spark.readStream.format("graft-lake").load(dir)
      .writeStream.option("checkpointLocation", s"$w/chk")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.add(df.select($"k").as[Long].collect().toSet); ()
      }.start()
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop() // consumed through v2
    assert(got.asScala.flatten.size == 15)
    // two more commits land, then retention drops everything the
    // follower has seen — v3's PREDECESSOR version file is gone
    CommitLog.append(spark, spark.range(200, 203).select($"id".as("k"),
      lit(2L).as("v"), lit("p1").as("pd")), dir) // v3
    CommitLog.append(spark, spark.range(300, 303).select($"id".as("k"),
      lit(3L).as("v"), lit("p0").as("pd")), dir) // v4
    CommitLog.vacuum(spark, dir, keepLast = 2, staleStagingMs = 0)
    got.clear()
    val q2 = run()
    val e = intercept[StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("vacuumed under") &&
      m.contains("NEW checkpoint")),
      s"recovery guidance expected, got: ${msgs(e)}")
    // and crucially: the 15 already-consumed rows were NOT re-delivered
    // as a giant "append" batch
    assert(!got.asScala.flatten.toSet.contains(0L),
      "the vacuumed follower silently re-delivered the whole table")
  }

  test("declared column order with a mid-schema partition column " +
    "streams correctly, including empty (compaction-only) batches") {
    val w = work()
    spark.conf.set("spark.sql.catalog.grec",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grec.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grec.db")
    // partition column pd sits in the MIDDLE of the declared schema;
    // every file read surfaces it LAST
    spark.sql("CREATE TABLE grec.db.mid (k BIGINT, pd STRING, v BIGINT) " +
      "PARTITIONED BY (pd)")
    spark.sql("INSERT INTO grec.db.mid " +
      "SELECT id, concat('p', id % 2), id % 5 FROM range(0, 12)")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, String, Long)]()
    val q = spark.readStream.table("grec.db.mid")
      .writeStream.option("checkpointLocation", s"$w/chk")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        assert(df.columns.toSeq == Seq("k", "pd", "v"),
          s"batch must surface the DECLARED order, got ${df.columns.toSeq}")
        df.select($"k", $"pd", $"v").as[(Long, String, Long)]
          .collect().foreach(got.add); ()
      }.start()
    try {
      q.processAllAvailable()
      assert(got.asScala.map(_._1).toSet == (0L until 12L).toSet)
      // a compaction-only version range produces an EMPTY batch — the
      // empty frame's order must not read as schema evolution
      val dir = graft.catalog.GraftCatalog.resolveTarget(spark,
        "grec.db.mid")
      CommitLog.compact(spark, dir, targetPartitions = 1)
      q.processAllAvailable()
      spark.sql("INSERT INTO grec.db.mid VALUES (900, 'p0', 1)")
      q.processAllAvailable()
      assert(got.asScala.exists(_._1 == 900L),
        "the stream must keep flowing after the compaction-only batch")
    } finally q.stop()
  }

  test("followAdditiveSchema=true rides out ADD COLUMNS (extras " +
    "dropped, the subscription keeps its declared schema); a retype " +
    "still aborts") {
    val w = work(); val dir = s"$w/lake"
    seed(dir, rows = 6)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
    val q = spark.readStream.format("graft-lake")
      .option("followAdditiveSchema", "true").load(dir)
      .writeStream.option("checkpointLocation", s"$w/chk")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        assert(df.columns.toSeq == Seq("k", "v", "pd"))
        got.add(df.select($"k").as[Long].collect().toSet); ()
      }.start()
    try {
      q.processAllAvailable()
      // additive evolution through an append: new column `note` —
      // the running subscription serves its declared columns
      CommitLog.append(spark,
        spark.range(50, 53).select($"id".as("k"), lit(9L).as("v"),
          lit("x").as("note"), lit("p0").as("pd"))
          .select($"k", $"v", $"pd", $"note"), dir)
      q.processAllAvailable()
      assert(got.asScala.flatten.toSet ==
        ((0L until 6L) ++ (50L until 53L)).toSet,
        "additive evolution must not stop the opted-in stream")
    } finally q.stop()
    // a RESTART picks up the widened schema and null back-fills the
    // pre-evolution files' missing column
    val w2 = s"$w/chk2"
    val widths = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val nulls = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q2 = spark.readStream.format("graft-lake")
      .option("startingVersion", "1")
      .option("followAdditiveSchema", "true").load(dir)
      .writeStream.option("checkpointLocation", w2)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        widths.add(df.columns.length)
        nulls.add(df.filter($"note".isNull).count()); ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(widths.asScala.forall(_ == 4),
      "post-evolution subscription reads 4 columns")
    assert(nulls.asScala.sum == 0L,
      "startingVersion=1 delivers only the post-v1 appends here (the " +
        "evolved append carries note); no spurious nulls")
    // non-additive: a retype under the subscription still aborts
    val q3 = spark.readStream.format("graft-lake")
      .option("followAdditiveSchema", "true").load(dir)
      .writeStream.option("checkpointLocation", s"$w/chk3")
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val e = intercept[StreamingQueryException] {
      try {
        q3.processAllAvailable()
        // a widening write retypes v long -> decimal(20,0): legal for
        // the TABLE, but not an additive change for the SUBSCRIPTION
        CommitLog.append(spark,
          spark.range(70, 72).select($"id".as("k"),
            ($"id" * 1).cast("decimal(20,0)").as("v"), lit(null)
              .cast("string").as("note"), lit("p0").as("pd"))
            .select($"k", $"v", $"pd", $"note"), dir)
        q3.processAllAvailable()
      } finally q3.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("schema changed") &&
      m.contains("not additive")),
      s"retype must abort even under followAdditiveSchema: ${msgs(e)}")
  }

  test("null back-fill: a subscription spanning an ADD COLUMNS reads " +
    "pre-evolution files with nulls in the new column") {
    val w = work(); val dir = s"$w/lake"
    seed(dir, rows = 4) // v1: columns (k, v, pd)
    CommitLog.append(spark, spark.range(10, 12).select($"id".as("k"),
      lit(1L).as("v"), lit("p0").as("pd")), dir) // v2: old shape
    CommitLog.append(spark,
      spark.range(20, 22).select($"id".as("k"), lit(2L).as("v"),
        lit("tagged").as("note"), lit("p1").as("pd"))
        .select($"k", $"v", $"pd", $"note"), dir) // v3: adds note
    // subscription starts AFTER the evolution: srcSchema has note, but
    // version 2's files predate it
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Option[String])]()
    val q = spark.readStream.format("graft-lake")
      .option("startingVersion", "1")
      .option("maxFilesPerTrigger", "1") // v2/v3 ALSO mix in one batch
      .option("followAdditiveSchema", "true").load(dir)
      .writeStream.option("checkpointLocation", s"$w/chk")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select($"k", $"note").as[(Long, Option[String])]
          .collect().foreach(rows.add); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val byK = rows.asScala.toMap
    assert(byK.keySet == Set(10L, 11L, 20L, 21L), s"got ${byK.keySet}")
    assert(byK(10L).isEmpty && byK(11L).isEmpty,
      "pre-evolution rows must null back-fill the new column")
    assert(byK(20L).contains("tagged") && byK(21L).contains("tagged"))
  }

  test("startingTimestamp resolves to the newest version at-or-before " +
    "it and streams exactly the versions after; a timestamp predating " +
    "the log fails loudly") {
    val w = work(); val dir = s"$w/lake"
    seed(dir, rows = 5) // v1
    CommitLog.append(spark, spark.range(100, 103).select($"id".as("k"),
      lit(1L).as("v"), lit("p0").as("pd")), dir) // v2
    Thread.sleep(30)
    val ts = System.currentTimeMillis()
    Thread.sleep(30)
    CommitLog.append(spark, spark.range(200, 204).select($"id".as("k"),
      lit(2L).as("v"), lit("p1").as("pd")), dir) // v3
    CommitLog.append(spark, spark.range(300, 302).select($"id".as("k"),
      lit(3L).as("v"), lit("p0").as("pd")), dir) // v4
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-lake")
      .option("startingTimestamp", ts.toString).load(dir)
      .writeStream.option("checkpointLocation", s"$w/chk")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select($"k").as[Long].collect().foreach(got.add); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(got.asScala.toSet ==
      ((200L until 204L) ++ Seq(300L, 301L)).toSet,
      s"timestamp base must deliver v3+v4 only — ${got.asScala}")
    // both options together: loud
    val both = intercept[Exception] {
      val qb = spark.readStream.format("graft-lake")
        .option("startingTimestamp", ts.toString)
        .option("startingVersion", "2").load(dir)
        .writeStream.option("checkpointLocation", s"$w/chkb")
        .foreachBatch {
          (_: org.apache.spark.sql.DataFrame, _: Long) => ()
        }.start()
      try qb.processAllAvailable() finally qb.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(both).exists(_.contains("mutually exclusive")))
    // predating the log: versionAsOf's loud error, not an empty stream
    val old = intercept[Exception] {
      val qo = spark.readStream.format("graft-lake")
        .option("startingTimestamp", "10000").load(dir)
        .writeStream.option("checkpointLocation", s"$w/chko")
        .foreachBatch {
          (_: org.apache.spark.sql.DataFrame, _: Long) => ()
        }.start()
      try qo.processAllAvailable() finally qo.stop()
    }
    assert(msgs(old).exists(_.contains("predates the log")),
      s"got: ${msgs(old)}")
  }

  test("maxBytesPerTrigger chunks by file SIZE (soft max), composes " +
    "with maxFilesPerTrigger, and still delivers exactly once") {
    val w = work(); val dir = s"$w/lake"
    spark.range(0, 600).repartition(6)
      .select($"id".as("k"), ($"id" % 7).as("v"),
        concat(lit("p"), ($"id" % 2)).as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
    val snap = CommitLog.latest(spark, dir).get
    val sizes = snap.files.map(f =>
      new java.io.File(s"$dir/$f").length())
    assert(sizes.size >= 6 && sizes.forall(_ > 0))
    // a cap of ~2 files forces >= files/3 batches (soft max: each
    // batch exceeds the cap by at most one file)
    val cap = sizes.sorted.take(2).sum
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
    val q = spark.readStream.format("graft-lake")
      .option("maxBytesPerTrigger", cap.toString).load(dir)
      .writeStream.option("checkpointLocation", s"$w/chk")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.select($"k").as[Long].collect().toSet); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val got = batches.asScala.toSeq
    assert(got.flatten.toSet == (0L until 600L).toSet &&
      got.map(_.size).sum == 600,
      "byte-capped chunking must deliver every row exactly once")
    assert(got.size >= sizes.size / 3,
      s"a ~2-file byte cap must chunk ${sizes.size} files into >= " +
        s"${sizes.size / 3} batches, got ${got.size}")
    // combined caps: the stricter (1 file) wins
    batches.clear()
    val q2 = spark.readStream.format("graft-lake")
      .option("maxBytesPerTrigger", (cap * 100).toString)
      .option("maxFilesPerTrigger", "1").load(dir)
      .writeStream.option("checkpointLocation", s"$w/chk2")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.select($"k").as[Long].collect().toSet); ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(batches.asScala.size >= sizes.size,
      "with both caps the stricter (1 file/trigger) must govern")
    assert(batches.asScala.flatten.toSet == (0L until 600L).toSet)
  }

  test("CDC admission control: maxCommitsPerTrigger drains a backlog " +
    "in version-granular bounded batches; AvailableNow terminates") {
    val w = work(); val dir = s"$w/lake"
    seed(dir, rows = 5) // v1 — subscription base
    val base = CommitLog.latest(spark, dir).get.version
    (0 until 4).foreach { b => // v2..v5: the backlog
      CommitLog.append(spark,
        spark.range(100L + b * 10, 103L + b * 10).select($"id".as("k"),
          lit(b.toLong).as("v"), lit("p0").as("pd")), dir)
    }
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val keys = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-lake")
      .option("readChangeFeed", "true").option("keyColumns", "k")
      .option("startingVersion", base.toString)
      .option("maxCommitsPerTrigger", "1").load(dir)
      .writeStream.option("checkpointLocation", s"$w/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ks = df.filter($"_change_type" === "insert")
          .select($"k").as[Long].collect()
        if (ks.nonEmpty) batches.add(ks.length)
        ks.foreach(keys.add); ()
      }.start()
    assert(q.awaitTermination(120000),
      "AvailableNow must drain the CDC backlog and terminate")
    assert(batches.size >= 4,
      s"4 backlog commits at 1/trigger must take >=4 batches, " +
        s"got ${batches.asScala.toList}")
    assert(batches.asScala.forall(_ == 3),
      "each batch must carry exactly one commit's churn")
    assert(keys.asScala.toSet ==
      (0 until 4).flatMap(b => 100L + b * 10 until 103L + b * 10).toSet,
      "bounded CDC drain must deliver every change exactly once")
  }

  test("property: randomized CDC commits, commit caps, and a mid-run " +
    "restart deliver every change exactly once") {
    val rnd = new scala.util.Random(1337)
    (1 to 3).foreach { trial =>
      val w = work(); val dir = s"$w/lake"
      seed(dir, rows = 5)
      val base = CommitLog.latest(spark, dir).get.version
      var next = 1000L
      def appendSome(): Seq[Long] = {
        val n = 1 + rnd.nextInt(4)
        val ks = (next until next + n); next += n
        CommitLog.append(spark,
          spark.createDataset(ks).toDF("k")
            .select($"k", lit(1L).as("v"),
              concat(lit("p"), ($"k" % 2)).as("pd")), dir)
        ks
      }
      val pre = (0 until 1 + rnd.nextInt(3)).flatMap(_ => appendSome())
      val cap = 1 + rnd.nextInt(3)
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      def run() = spark.readStream.format("graft-lake")
        .option("readChangeFeed", "true").option("keyColumns", "k")
        .option("startingVersion", base.toString)
        .option("maxCommitsPerTrigger", cap.toString).load(dir)
        .writeStream.option("checkpointLocation", s"$w/chk")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.filter($"_change_type" === "insert").select($"k")
            .as[Long].collect().foreach(got.add); ()
        }.start()
      val q1 = run()
      try q1.processAllAvailable() finally q1.stop()
      val post = (0 until 1 + rnd.nextInt(3)).flatMap(_ => appendSome())
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()
      val all = got.asScala.toList
      val expect = pre ++ post
      assert(all.size == expect.size && all.toSet == expect.toSet,
        s"trial $trial (cap=$cap): delivered ${all.size} of " +
          s"${expect.size} inserts")
    }
  }
}

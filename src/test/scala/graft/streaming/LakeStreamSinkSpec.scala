package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.CommitLog

/** [[LakeStreamSink]] — `writeStream.format("graft-lake")`: each
  * micro-batch is one commit, exactly-once through the per-query txn
  * ledger (a replayed epoch is a no-op; a FRESH query id is a fresh
  * ledger), reachable by path and by catalog name (`.toTable`), in
  * append / update(upsert) / complete(overwrite) modes. */
class LakeStreamSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def work(): String = {
    val d = Files.createTempDirectory("graft_sink_")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def seed(dir: String, rows: Long = 10): Unit = {
    spark.range(0, rows).select($"id".as("k"), ($"id" % 7).as("v"),
      concat(lit("p"), ($"id" % 2)).as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
  }

  private def dropLastCommit(chk: String): Unit = {
    val dir = new java.io.File(s"$chk/commits")
    val fs = Option(dir.listFiles).getOrElse(Array.empty)
      .filter(_.getName.forall(_.isDigit))
    assert(fs.nonEmpty, s"no commit files under $chk/commits")
    val last = fs.maxBy(_.getName.toLong)
    val crc = new java.io.File(dir, s".${last.getName}.crc")
    assert(last.delete())
    if (crc.exists) crc.delete()
  }

  test("append sink: source table -> sink table, bootstrap from the " +
    "first batch, one commit per micro-batch, exactly once") {
    val w = work(); val src = s"$w/src"; val out = s"$w/out"
    seed(src, rows = 10)
    def run() = spark.readStream.format("graft-lake").load(src)
      .writeStream.format("graft-lake")
      .option("checkpointLocation", s"$w/chk")
      .start(out)
    val q = run()
    try {
      q.processAllAvailable()
      assert(CommitLog.read(spark, out).count() == 10,
        "bootstrap from the initial snapshot batch")
      CommitLog.append(spark, spark.range(100, 105).select($"id".as("k"),
        lit(1L).as("v"), lit("p0").as("pd")), src)
      q.processAllAvailable()
      assert(CommitLog.read(spark, out).count() == 15)
      assert(CommitLog.read(spark, out).select($"k").as[Long]
        .collect().toSet ==
        ((0L until 10L) ++ (100L until 105L)).toSet)
    } finally q.stop()
    // the sink table is a real lake: partition layout from the source
    // rows, commit history one version per non-empty batch
    assert(CommitLog.latest(spark, out).get.version == 2)
    // restart with commits landing while down — still exactly once
    CommitLog.append(spark, spark.range(200, 203).select($"id".as("k"),
      lit(2L).as("v"), lit("p1").as("pd")), src)
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    assert(CommitLog.read(spark, out).count() == 18)
  }

  test("a replayed epoch is a no-op: crash between the sink commit " +
    "and the checkpoint commit does not double-apply") {
    val w = work(); val src = s"$w/src"; val out = s"$w/out"
    seed(src, rows = 8)
    def run() = spark.readStream.format("graft-lake").load(src)
      .writeStream.format("graft-lake")
      .option("checkpointLocation", s"$w/chk")
      .start(out)
    val q = run()
    try q.processAllAvailable() finally q.stop()
    assert(CommitLog.read(spark, out).count() == 8)
    val vAfter = CommitLog.latest(spark, out).get.version
    // crash shape: sink committed, checkpoint commit lost → the engine
    // re-runs the same (queryId, batchId) epoch on restart
    dropLastCommit(s"$w/chk")
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    assert(CommitLog.read(spark, out).count() == 8,
      "the replayed epoch must be a ledger no-op, not a double append")
    assert(CommitLog.latest(spark, out).get.version == vAfter,
      "a skipped replay must not even commit a version")
  }

  test("a FRESH query (new checkpoint, batch ids restarting at 0) " +
    "gets a fresh ledger instead of being skipped") {
    val w = work(); val out = s"$w/out"
    val srcA = s"$w/srcA"; val srcB = s"$w/srcB"
    seed(srcA, rows = 5)
    seed(srcB, rows = 3)
    val qa = spark.readStream.format("graft-lake").load(srcA)
      .writeStream.format("graft-lake")
      .option("checkpointLocation", s"$w/chkA").start(out)
    try qa.processAllAvailable() finally qa.stop()
    assert(CommitLog.read(spark, out).count() == 5)
    // second query, same target, OWN checkpoint: its batch 0 must land
    // (a shared single-sequence ledger would silently skip it)
    val qb = spark.readStream.format("graft-lake").load(srcB)
      .writeStream.format("graft-lake")
      .option("checkpointLocation", s"$w/chkB").start(out)
    try qb.processAllAvailable() finally qb.stop()
    assert(CommitLog.read(spark, out).count() == 8,
      "the second query's batch 0 must not be skipped by the first's " +
        "ledger")
    val props = CommitLog.latest(spark, out).get.props
    assert(props.keys.count(_.startsWith("graft.txn.")) == 2,
      s"one ledger entry per query, got ${props.keys.toSeq.sorted}")
  }

  test("TWO concurrent streams into one target table: per-query " +
    "ledgers isolate, append commits rebase, every row lands exactly " +
    "once") {
    val w = work(); val out = s"$w/out"
    val srcA = s"$w/srcA"; val srcB = s"$w/srcB"
    seed(srcA, rows = 6)
    seed(srcB, rows = 4)
    def run(src: String, chk: String) =
      spark.readStream.format("graft-lake").load(src)
        .writeStream.format("graft-lake")
        .option("checkpointLocation", chk).start(out)
    val qa = run(srcA, s"$w/chkA")
    val qb = run(srcB, s"$w/chkB")
    try {
      qa.processAllAvailable(); qb.processAllAvailable()
      // interleaved appends on both sources while both streams run
      (0 until 4).foreach { b =>
        CommitLog.append(spark, Seq((1000L + b, 1L, "p0"))
          .toDF("k", "v", "pd"), srcA)
        CommitLog.append(spark, Seq((2000L + b, 2L, "p1"))
          .toDF("k", "v", "pd"), srcB)
        qa.processAllAvailable(); qb.processAllAvailable()
      }
    } finally { qa.stop(); qb.stop() }
    val got = CommitLog.read(spark, out).select($"k").as[Long]
      .collect().toList
    val expect = (0L until 6L) ++ (0L until 4L) ++
      (1000L until 1004L) ++ (2000L until 2004L)
    assert(got.size == expect.size &&
      got.groupBy(identity).values.forall(_.size <= 2),
      s"concurrent sinks must not duplicate: ${got.sorted}")
    assert(got.sorted == expect.sorted.toList,
      s"both streams' rows must land exactly once: ${got.sorted}")
    val props = CommitLog.latest(spark, out).get.props
    assert(props.keys.count(_.startsWith("graft.txn.")) == 2,
      "each query keeps its own ledger entry")
  }

  test("writeStream.toTable on a graft catalog name routes through " +
    "the v1 fallback to the exactly-once sink") {
    val w = work(); val src = s"$w/src"
    seed(src, rows = 12)
    spark.conf.set("spark.sql.catalog.gsink",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsink.warehouse", s"$w/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsink.db")
    spark.sql("CREATE TABLE gsink.db.landed " +
      "(k BIGINT, v BIGINT, pd STRING) PARTITIONED BY (pd)")
    val q = spark.readStream.format("graft-lake").load(src)
      .writeStream.format("graft-lake")
      .option("checkpointLocation", s"$w/chk")
      .toTable("gsink.db.landed")
    try {
      q.processAllAvailable()
      assert(spark.table("gsink.db.landed").count() == 12,
        "the catalog read must see the streamed rows")
      CommitLog.append(spark, spark.range(500, 503)
        .select($"id".as("k"), lit(9L).as("v"), lit("p1").as("pd")), src)
      q.processAllAvailable()
      assert(spark.table("gsink.db.landed").count() == 15)
      // and SQL sees them too — the sink landed real commits
      assert(spark.sql(
        "SELECT count(*) FROM gsink.db.landed WHERE k >= 500")
        .as[Long].head() == 3L)
    } finally q.stop()
  }

  test("autoCompact bounds the small-files accumulation of a " +
    "long-lived append stream; rows exact; downstream streams see " +
    "no row movement") {
    val w = work(); val src = s"$w/src"; val out = s"$w/out"
    seed(src, rows = 4)
    val q = spark.readStream.format("graft-lake").load(src)
      .writeStream.format("graft-lake")
      .partitionBy("pd") // the sink bootstraps this hive layout
      .option("autoCompact", "true")
      .option("autoCompactMinFiles", "4")
      .option("checkpointLocation", s"$w/chk")
      .start(out)
    // a downstream follower of the SINK table: compactions must be
    // invisible to it
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    try {
      q.processAllAvailable()
      val q2 = spark.readStream.format("graft-lake").load(out)
        .writeStream.option("checkpointLocation", s"$w/chk2")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select($"k").as[Long].collect().foreach(seen.add); ()
        }.start()
      try {
        // 12 micro-batches of appends — without maintenance this
        // accumulates 12+ files per partition
        (0 until 12).foreach { b =>
          CommitLog.append(spark,
            Seq((1000L + b, 1L, "p0"), (2000L + b, 2L, "p1"))
              .toDF("k", "v", "pd"), src)
          q.processAllAvailable()
        }
        q2.processAllAvailable()
      } finally q2.stop()
    } finally q.stop()
    val snap = CommitLog.latest(spark, out).get
    val perPart = snap.files.groupBy(f => f.take(f.lastIndexOf('/')))
      .map { case (d, fs) => d -> fs.size }
    assert(perPart.values.max < 8,
      s"auto-compact must bound per-partition file count, got $perPart")
    assert(CommitLog.read(spark, out).count() == 4 + 24,
      "maintenance must not lose or duplicate rows")
    assert(seen.asScala.toSet ==
      CommitLog.read(spark, out).select($"k").as[Long].collect().toSet,
      "the downstream follower must see every row exactly once — " +
        "compactions deliver nothing")
    // compaction commits really happened (the policy fired)
    // (check history: at least one op=compact among recent versions)
    val ops = (1L to snap.version)
      .map(v => CommitLog.snapshotAt(spark, out, v).op)
    assert(ops.contains("compact"),
      s"expected op=compact commits in the history, got $ops")
  }

  private implicit class QAsScala[A](
      q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala: Iterable[A] = {
      import scala.jdk.CollectionConverters._
      q.iterator().asScala.toSeq
    }
  }

  test("applyChangeFeed: CDC source -> CDC-apply sink replicates a " +
    "table through inserts, updates, AND deletes — no foreachBatch") {
    val w = work(); val src = s"$w/src"; val mirror = s"$w/mirror"
    // v1: empty create so the whole life flows through the feed
    CommitLog.create(spark,
      src, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("pd",
          org.apache.spark.sql.types.StringType))),
      partCols = Seq("pd"))
    def run() = spark.readStream.format("graft-lake")
      .option("readChangeFeed", "true").option("keyColumns", "k")
      .option("startingVersion", "1").load(src)
      .writeStream.format("graft-lake")
      .outputMode("update")
      .option("applyChangeFeed", "true")
      .option("keyColumns", "k").option("partitionColumn", "pd")
      .option("checkpointLocation", s"$w/chk")
      .start(mirror)
    val q = run()
    try {
      CommitLog.append(spark, spark.range(0, 10).select($"id".as("k"),
        ($"id" % 7).as("v"), concat(lit("p"), ($"id" % 2)).as("pd")),
        src)
      q.processAllAvailable()
      CommitLog.upsert(spark,
        Seq((3L, 99L, "p1"), (100L, 1L, "p0")).toDF("k", "v", "pd"),
        src, Seq("k"), "pd")
      q.processAllAvailable()
      CommitLog.delete(spark, src, $"k" % 4L === 0L)
      q.processAllAvailable()
      val want = CommitLog.read(spark, src)
        .as[(Long, Long, String)].collect().toSet
      val got = CommitLog.read(spark, mirror)
        .as[(Long, Long, String)].collect().toSet
      assert(got == want,
        s"mirror must equal the source's final state\n got=$got\nwant=$want")
      assert(got.exists(_ == (3L, 99L, "p1")) && !got.exists(_._1 == 4L),
        "updates and deletes must both have applied")
    } finally q.stop()
    // replay-safety: drop the last checkpoint commit, restart — the
    // replayed merge epoch must be a txn-ledger no-op
    val before = CommitLog.read(spark, mirror)
      .as[(Long, Long, String)].collect().toSet
    val vBefore = CommitLog.latest(spark, mirror).get.version
    dropLastCommit(s"$w/chk")
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    assert(CommitLog.read(spark, mirror)
      .as[(Long, Long, String)].collect().toSet == before,
      "a replayed CDC-apply epoch must not double-apply")
    assert(CommitLog.latest(spark, mirror).get.version == vBefore)
  }

  test("property: random batch shapes, chunk sizes, restarts, and " +
    "CRASH-SHAPED replays (dropped checkpoint commits) still land " +
    "every row exactly once through the sink") {
    val rnd = new scala.util.Random(4242)
    (1 to 3).foreach { trial =>
      val w = work(); val src = s"$w/src"; val out = s"$w/out"
      val seedRows = 5 + rnd.nextInt(10)
      spark.range(0, seedRows).repartition(1 + rnd.nextInt(3))
        .select($"id".as("k"), lit(0L).as("v"),
          concat(lit("p"), ($"id" % 2)).as("pd"))
        .write.partitionBy("pd").parquet(src)
      CommitLog.init(spark, src)
      var next = 1000L
      def appendSome(): Seq[Long] = {
        val n = 2 + rnd.nextInt(6)
        val ks = (next until next + n); next += n
        CommitLog.append(spark,
          spark.createDataset(ks).toDF("k")
            .repartition(1 + rnd.nextInt(2))
            .select($"k", lit(1L).as("v"),
              concat(lit("p"), ($"k" % 2)).as("pd")), src)
        ks
      }
      val maxFiles = 1 + rnd.nextInt(3)
      def run() = spark.readStream.format("graft-lake")
        .option("maxFilesPerTrigger", maxFiles.toString).load(src)
        .writeStream.format("graft-lake")
        .option("checkpointLocation", s"$w/chk").start(out)
      var expect: Seq[Long] = 0L until seedRows
      (0 until 3).foreach { leg =>
        expect = expect ++ (0 until rnd.nextInt(3))
          .flatMap(_ => appendSome())
        val q = run()
        try q.processAllAvailable() finally q.stop()
        // crash shape on some legs: the engine will replay the last
        // epoch against a sink that already committed it
        if (rnd.nextBoolean()) dropLastCommit(s"$w/chk")
      }
      val q = run()
      try q.processAllAvailable() finally q.stop()
      val got = CommitLog.read(spark, out).select($"k").as[Long]
        .collect().toList
      assert(got.size == expect.size && got.toSet == expect.toSet,
        s"trial $trial (maxFiles=$maxFiles): sink landed ${got.size} " +
          s"of ${expect.size} rows — duplicates or losses\n" +
          s"extra=${got.diff(expect).sorted} missing=${expect.diff(got).sorted}")
    }
  }

  test("update mode executes the upstream plan exactly ONCE per " +
    "trigger — the emptiness branch reads the spilled materialization, " +
    "never re-runs the batch plan") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val w = work(); val out = s"$w/out"
    val mem = MemoryStream[Long]
    val acc = spark.sparkContext.longAccumulator("upstream-executions")
    // the accumulator counts upstream ROW materializations: with the
    // old isEmpty probe every trigger paid the plan twice (2 rows per
    // input row); the spilled-once shape pays exactly one
    val df = mem.toDS().map { v =>
      acc.add(1L); (v, v % 7, s"p${v % 2}")
    }.toDF("k", "v", "pd")
    val q = df.writeStream.format("graft-lake")
      .outputMode("update")
      .option("keyColumns", "k")
      .option("partitionColumn", "pd")
      .option("checkpointLocation", s"$w/chk")
      .start(out)
    try {
      mem.addData(0L, 1L, 2L, 3L)
      q.processAllAvailable()
      mem.addData(4L, 5L)
      q.processAllAvailable()
      assert(CommitLog.read(spark, out).count() == 6)
      assert(acc.value == 6L,
        s"upstream plan ran ${acc.value / 6.0}x per trigger — the " +
          "update path must execute the micro-batch exactly once")
    } finally q.stop()
  }

  test("a data-free first update-mode batch leaves NO table directory " +
    "behind — a later create-by-write must not refuse a table that " +
    "was never committed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val w = work(); val out = s"$w/out"
    val mem = MemoryStream[Long]
    // every row filters away upstream: batch 0 executes with 0 rows
    val df = mem.toDS().toDF("k")
      .filter($"k" < 0L)
      .select($"k", ($"k" % 7).as("v"), lit("p0").as("pd"))
    val q = df.writeStream.format("graft-lake")
      .outputMode("update")
      .option("keyColumns", "k")
      .option("partitionColumn", "pd")
      .option("checkpointLocation", s"$w/chk")
      .start(out)
    try {
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
    } finally q.stop()
    assert(CommitLog.latest(spark, out).isEmpty, "no commit expected")
    assert(!new java.io.File(out).exists(),
      "the data-free batch's spill left a residue-only table directory")
    // the path is genuinely free: create-by-write bootstraps cleanly
    spark.range(0, 4).select($"id".as("k"), ($"id" % 7).as("v"),
      lit("p0").as("pd"))
      .write.format("graft-lake").partitionBy("pd").save(out)
    assert(CommitLog.read(spark, out).count() == 4)
  }

  test("update mode upserts by key (sequence-aware); complete mode " +
    "replaces the snapshot per batch") {
    val w = work(); val src = s"$w/src"; val out = s"$w/out"
    seed(src, rows = 6) // k = 0..5, v = k % 7, pd = p(k%2)
    val q = spark.readStream.format("graft-lake").load(src)
      .writeStream.format("graft-lake")
      .outputMode("update")
      .option("keyColumns", "k")
      .option("partitionColumn", "pd")
      .option("sequenceColumn", "v")
      .option("checkpointLocation", s"$w/chk")
      .start(out)
    try {
      q.processAllAvailable()
      assert(CommitLog.read(spark, out).count() == 6)
      // same keys again with higher sequence → updates, not duplicates
      CommitLog.append(spark, spark.range(0, 3).select($"id".as("k"),
        lit(99L).as("v"), concat(lit("p"), ($"id" % 2)).as("pd")), src)
      q.processAllAvailable()
      val rows = CommitLog.read(spark, out)
        .select($"k", $"v").as[(Long, Long)].collect().toMap
      assert(rows.size == 6, s"upsert must converge by key: $rows")
      assert((0L until 3L).forall(k => rows(k) == 99L),
        s"higher-sequence images must win: $rows")
    } finally q.stop()
    // complete mode: a streaming aggregate whose every batch replaces the
    // snapshot — final state equals the batch recompute
    val agg = s"$w/agg"
    val q2 = spark.readStream.format("graft-lake").load(src)
      .groupBy($"pd").agg(count(lit(1)).as("n"))
      .writeStream.format("graft-lake")
      .outputMode("complete")
      .option("checkpointLocation", s"$w/chk2")
      .start(agg)
    try {
      q2.processAllAvailable()
      val expect = CommitLog.read(spark, src).groupBy($"pd")
        .agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toSet
      assert(CommitLog.read(spark, agg).as[(String, Long)]
        .collect().toSet == expect,
        "complete mode must equal the batch recompute")
    } finally q2.stop()
  }
}

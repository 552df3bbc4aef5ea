package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[CommitLog]]: a reader must see a complete pre- or post-commit
  * snapshot — never a torn mix — across upsert, compaction, and the
  * stats snapshot riding the commit; the single-writer contract must be
  * ENFORCED by the version-file CAS, not just documented.
  */
class CommitLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 3 partitions × disjoint id ranges, logged with stats on k. */
  private def freshLake(statsCols: Seq[String] = Seq("k")): String = {
    val dir = Files.createTempDirectory("graft_log_").toString + "/lake"
    spark.range(0, 3000)
      .select($"id".as("k"), ($"id" % 7).as("v"),
        concat(lit("d"), ($"id" / 1000).cast("long")).as("pd"))
      .repartitionByRange(6, $"k")
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir, statsCols)
    dir
  }

  private def state(dir: String): Set[(Long, Long, String)] =
    CommitLog.read(spark, dir).select($"k", $"v", $"pd")
      .as[(Long, Long, String)].collect().toSet

  test("init + read round-trips; an uncommitted file is invisible") {
    val dir = freshLake()
    assert(CommitLog.read(spark, dir).count() == 3000L)
    // a crashed writer left a data file no version references — a torn
    // mix would surface its rows; the log must not see them
    spark.range(90000, 90100)
      .select($"id".as("k"), lit(0L).as("v"))
      .coalesce(1).write.mode("append").parquet(s"$dir/pd=d0")
    assert(CommitLog.read(spark, dir).count() == 3000L,
      "uncommitted file leaked into the snapshot")
  }

  test("upsert is copy-on-write: old version still readable, new merged") {
    val dir = freshLake()
    val v1 = CommitLog.latest(spark, dir).get
    val updates = spark.range(1000, 1100)
      .select($"id".as("k"), lit(99L).as("v"), lit("d1").as("pd"))
    val v2 = CommitLog.upsert(spark, updates, dir, Seq("k"), "pd")
    assert(v2.version == v1.version + 1)
    // post-state: merged
    val got = state(dir)
    assert(got.count(_._2 == 99L) == 100)
    assert(got.size == 3000)
    // pre-state: version 1 reads EXACTLY the original rows (no deletes)
    assert(CommitLog.readAt(spark, dir, v1.version)
      .filter($"v" === 99L).count() == 0L)
    assert(CommitLog.readAt(spark, dir, v1.version).count() == 3000L)
    // untouched partitions keep their exact files in the new snapshot
    val v1Files = v1.files.filterNot(_.startsWith("pd=d1/")).toSet
    assert(v1Files.subsetOf(v2.files.toSet), "untouched partition was rewritten")
    assert(v2.files.filter(_.startsWith("pd=d1/")).toSet
      .intersect(v1.files.toSet).isEmpty, "touched partition kept stale files")
  }

  test("the version-file CAS enforces single-writer loudly, log intact") {
    val dir = freshLake()
    val v1 = CommitLog.latest(spark, dir).get
    // a crashed (or racing) writer left a version file the reader cannot
    // use — our writer reads v1, computes v2, and must fail the CAS
    // instead of overwriting the other writer's commit point
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val racing = new org.apache.hadoop.fs.Path(
      s"$dir/_graft_log", f"v${v1.version + 1}%020d.json")
    val out = f.create(racing, false)
    out.write("""{"version":2,"files":["pd=""".getBytes("UTF-8")) // mid-crash
    out.close()
    val updates = Seq((1L, 555L, "d0")).toDF("k", "v", "pd")
    val e = intercept[IllegalStateException] {
      CommitLog.upsert(spark, updates, dir, Seq("k"), "pd")
    }
    assert(e.getMessage.contains("single-writer"), e.getMessage)
    // the reader still sees the consistent PRE-state: full table, none
    // of the failed writer's rows
    assert(CommitLog.read(spark, dir).count() == 3000L)
    assert(CommitLog.read(spark, dir).filter($"v" === 555L).count() == 0L)
  }

  test("a valid racing commit serializes: the writer builds on it, not over it") {
    val dir = freshLake()
    val v1 = CommitLog.latest(spark, dir).get
    // the racer COMMITTED v2 before our writer started: our writer must
    // read v2 and commit v3 on top — serialized, no conflict, no loss
    val racerUpdates = spark.range(0, 10)
      .select($"id".as("k"), lit(77L).as("v"), lit("d0").as("pd"))
    CommitLog.upsert(spark, racerUpdates, dir, Seq("k"), "pd")
    val ourUpdates = spark.range(2000, 2010)
      .select($"id".as("k"), lit(88L).as("v"), lit("d2").as("pd"))
    val v3 = CommitLog.upsert(spark, ourUpdates, dir, Seq("k"), "pd")
    assert(v3.version == v1.version + 2)
    val got = state(dir)
    assert(got.count(_._2 == 77L) == 10 && got.count(_._2 == 88L) == 10,
      "a serialized commit lost the racer's rows")
  }

  test("a corrupt newest version file degrades to the previous version") {
    val dir = freshLake()
    val v1 = CommitLog.latest(spark, dir).get
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val torn = new org.apache.hadoop.fs.Path(
      s"$dir/_graft_log", f"v${v1.version + 1}%020d.json")
    val out = f.create(torn, false)
    out.write("""{"version":2,"files":["pd=""".getBytes("UTF-8")) // truncated
    out.close()
    val s = CommitLog.latest(spark, dir).get
    assert(s.version == v1.version, "corrupt version file was not skipped")
    assert(CommitLog.read(spark, dir).count() == 3000L)
  }

  test("a committed batch id replays as a no-op (ledger rides the commit)") {
    val dir = freshLake()
    val updates = spark.range(0, 50)
      .select($"id".as("k"), lit(7L).as("v"), lit("d0").as("pd"))
    val v2 = CommitLog.upsert(spark, updates, dir, Seq("k"), "pd",
      batchId = Some(42L))
    assert(v2.batches == Seq(42L))
    val replay = CommitLog.upsert(spark, updates, dir, Seq("k"), "pd",
      batchId = Some(42L))
    assert(replay.version == v2.version, "replayed batch produced a new commit")
    assert(state(dir) == state(dir)) // and reads stay stable
  }

  test("seqCol: a stale update cannot regress a committed row") {
    val dir = Files.createTempDirectory("graft_log_seq_").toString + "/lake"
    Seq((1L, 5L, "v5", "d1"), (2L, 1L, "b1", "d1"))
      .toDF("k", "seq", "v", "pd").write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
    val stale = Seq((1L, 3L, "v3", "d1"), (3L, 1L, "c", "d1"))
      .toDF("k", "seq", "v", "pd")
    CommitLog.upsert(spark, stale, dir, Seq("k"), "pd", seqCol = Some("seq"))
    val got = CommitLog.read(spark, dir)
      .select($"k", $"seq", $"v").as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 5L, "v5"), (2L, 1L, "b1"), (3L, 1L, "c")))
  }

  test("compact shrinks files, preserves rows, keeps history readable") {
    val dir = freshLake()
    val v1 = CommitLog.latest(spark, dir).get
    val v2 = CommitLog.compact(spark, dir, targetPartitions = 1)
    assert(v2.files.size < v1.files.size,
      s"no compaction: ${v1.files.size} -> ${v2.files.size}")
    assert(state(dir).size == 3000)
    assert(CommitLog.readAt(spark, dir, v1.version).count() == 3000L)
    // hive layout survived the copy-on-write rewrite
    assert(v2.files.forall(_.startsWith("pd=")), v2.files.mkString(","))
  }

  test("stats ride the commit: pruning works after upsert AND compact, no rebuild call") {
    val dir = freshLake(statsCols = Seq("k"))
    val updates = spark.range(1000, 1100)
      .select($"id".as("k"), lit(99L).as("v"), lit("d1").as("pd"))
    CommitLog.upsert(spark, updates, dir, Seq("k"), "pd")
    val (d0, (read1, total1)) = CommitLog.scanRange(spark, dir, "k", 0L, 999L)
    assert(read1 < total1, s"no pruning after upsert: $read1/$total1")
    assert(d0.count() == 1000L)
    // the merged slice is visible through the committed stats
    val (d1, _) = CommitLog.scanRange(spark, dir, "k", 1000L, 1099L)
    assert(d1.filter($"v" === 99L).count() == 100L)
    CommitLog.compact(spark, dir, targetPartitions = 2)
    val (_, (probeRead, probeTotal)) =
      CommitLog.scanRange(spark, dir, "k", 5000000L, 6000000L)
    assert(probeTotal > 0 && probeRead == 0,
      s"stats stale after compact: $probeRead/$probeTotal")
    val (d0b, (read2, total2)) = CommitLog.scanRange(spark, dir, "k", 0L, 999L)
    assert(read2 <= total2 && d0b.count() == 1000L)
  }

  test("vacuum deletes only unreferenced files; latest survives") {
    val dir = freshLake()
    val v1 = CommitLog.latest(spark, dir).get
    val updates = spark.range(0, 10)
      .select($"id".as("k"), lit(3L).as("v"), lit("d0").as("pd"))
    CommitLog.upsert(spark, updates, dir, Seq("k"), "pd")
    CommitLog.compact(spark, dir, targetPartitions = 1)
    val before = state(dir)
    val dead = CommitLog.vacuum(spark, dir, keepLast = 1)
    assert(dead.nonEmpty, "vacuum found nothing to delete")
    assert(state(dir) == before, "vacuum changed the visible table")
    // dropped versions are gone
    intercept[IllegalArgumentException] {
      CommitLog.readAt(spark, dir, v1.version)
    }
    // and pruning still works off the kept stats snapshot
    val (_, (r, t)) = CommitLog.scanRange(spark, dir, "k", 5000000L, 6000000L)
    assert(t > 0 && r == 0)
  }
}

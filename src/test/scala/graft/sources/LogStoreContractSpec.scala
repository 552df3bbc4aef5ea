package graft.sources

import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CyclicBarrier}
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The pluggable commit CAS ([[LogStore]]): the conditional-put backend
  * must serialize racing committers exactly like the POSIX O_EXCL
  * default, the naive check-then-create shape it replaces must
  * demonstrably lose the race (why the seam exists), and a lake whose
  * scheme routes through a registered backend must commit end-to-end. */
class LogStoreContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A put with the OBJECT-STORE atomicity contract: the existence
    * condition and the write are one atomic step (here: a JVM-wide
    * putIfAbsent standing in for S3's `If-None-Match: *`), never a
    * separate exists() + write. */
  private def conditionalPut(
      puts: AtomicInteger): (Path, Array[Byte]) => Boolean = { (p, bytes) =>
    puts.incrementAndGet()
    val local = java.nio.file.Paths.get(p.toUri.getPath)
    java.nio.file.Files.createDirectories(local.getParent)
    try {
      java.nio.file.Files.write(local, bytes,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false // 412
    }
  }

  test("conditional put: 8 racing committers to one key, exactly one wins") {
    val dir = Files.createTempDirectory("graft_ls_race_").toString
    val store = new ConditionalPutLogStore(conditionalPut(new AtomicInteger))
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(dir, "v1.json")
    val barrier = new CyclicBarrier(8)
    val wins = new AtomicInteger
    val conflicts = new AtomicInteger
    val errs = new ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 8).map { i =>
      val t = new Thread(() => {
        try {
          barrier.await()
          store.casWrite(fs, p, s"writer-$i")
          wins.incrementAndGet()
        } catch {
          case _: CommitLog.CommitConflict => conflicts.incrementAndGet()
          case e: Throwable => errs.add(e)
        }
      })
      t.start(); t
    }
    threads.foreach(_.join(30000))
    assert(errs.isEmpty, s"unexpected failures: $errs")
    assert(wins.get() == 1, s"exactly one writer must win, got ${wins.get()}")
    assert(conflicts.get() == 7)
    // the surviving content is the winner's, intact
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p.toUri.getPath)))
    assert(content.startsWith("writer-"))
  }

  test("why the seam exists: check-then-create double-succeeds inside " +
    "the TOCTOU window; the conditional put cannot") {
    val dir = Files.createTempDirectory("graft_ls_toctou_").toString
    val key = java.nio.file.Paths.get(dir, "v.json")
    // both writers pass the existence CHECK before either writes — the
    // interleaving a busy object store produces constantly
    val checked = new CyclicBarrier(2)
    def naivePut(tag: String): Boolean = {
      val absent = !java.nio.file.Files.exists(key) // CHECK
      checked.await() // ...the other writer checks here too
      if (!absent) false
      else {
        java.nio.file.Files.write(key, tag.getBytes) // CREATE (clobbers!)
        true
      }
    }
    val naiveWins = new AtomicInteger
    val ts = Seq("a", "b").map { tag =>
      val t = new Thread(() =>
        if (naivePut(tag)) naiveWins.incrementAndGet())
      t.start(); t
    }
    ts.foreach(_.join(30000))
    assert(naiveWins.get() == 2,
      "the naive shape reports BOTH writers as committed — silent loss")

    // same interleaving through the conditional put: one winner
    val store = new ConditionalPutLogStore(conditionalPut(new AtomicInteger))
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val p2 = new Path(dir, "v2.json")
    val barrier2 = new CyclicBarrier(2)
    val condWins = new AtomicInteger
    val ts2 = Seq("a", "b").map { tag =>
      val t = new Thread(() => {
        barrier2.await()
        try { store.casWrite(fs, p2, tag); condWins.incrementAndGet() }
        catch { case _: CommitLog.CommitConflict => }
      })
      t.start(); t
    }
    ts2.foreach(_.join(30000))
    assert(condWins.get() == 1)
  }

  test("end-to-end: lake commits route through a registered backend; " +
    "racing disjoint upserts both land via rebase") {
    val puts = new AtomicInteger
    val store = new ConditionalPutLogStore(conditionalPut(puts))
    LogStore.register("file", store)
    try {
      val dir = Files.createTempDirectory("graft_ls_e2e_").toString + "/lake"
      spark.range(0, 40)
        .select($"id".as("k"), $"id".as("v"),
          concat(lit("p"), ($"id" % 2)).as("pd"))
        .write.partitionBy("pd").parquet(dir)
      CommitLog.init(spark, dir)
      assert(puts.get() >= 1, "init's commit must route through the store")
      val barrier = new CyclicBarrier(2)
      val errs = new ConcurrentLinkedQueue[Throwable]()
      def upserter(part: String, k: Long): Thread = {
        val t = new Thread(() => {
          try {
            barrier.await()
            CommitLog.upsert(spark,
              Seq((k, k * 100, part)).toDF("k", "v", "pd"),
              dir, Seq("k"), "pd")
          } catch { case e: Throwable => errs.add(e) }
        })
        t.start(); t
      }
      val ts = Seq(upserter("p0", 0L), upserter("p1", 1L))
      ts.foreach(_.join(60000))
      assert(errs.isEmpty, s"racing upserts failed: $errs")
      val got = CommitLog.read(spark, dir).filter($"k" <= 1)
        .select($"k", $"v").as[(Long, Long)].collect().toSet
      assert(got == Set((0L, 0L), (1L, 100L)),
        "both disjoint-partition commits must land (loser rebases)")
    } finally LogStore.unregister("file")
  }

  test("property: randomized N-writer commit STORM through the " +
    "object-store CAS — appends + DML + racing branch creates across " +
    "two branches; every version file has one writer, every CAS " +
    "domain's log replays to its model") {
    for (seed <- Seq(5, 17, 29)) {
      val puts = new AtomicInteger
      LogStore.register("file", new ConditionalPutLogStore(
        conditionalPut(puts)))
      try {
        val dir =
          Files.createTempDirectory("graft_storm_").toString + "/lake"
        val nWriters = 6
        // one hive partition per writer: upserts stay conflict-free by
        // construction (the model needs determinism; TRUE conflicts are
        // the conflicting-partitions tests' business), while every
        // commit still races every other on the version-file CAS
        spark.range(0, nWriters.toLong)
          .select($"id".as("k"), $"id".as("v"),
            concat(lit("t"), $"id" % nWriters).as("pd"))
          .write.partitionBy("pd").parquet(dir)
        CommitLog.init(spark, dir)
        CommitLog.createBranch(spark, dir, "b1")
        CommitLog.createBranch(spark, dir, "b2")
        val targets = Seq(dir, s"$dir@b1", s"$dir@b2")
        val baseVersion = targets.map(t =>
          t -> CommitLog.latest(spark, t).get.version).toMap

        // the model: per (target, key) -> value, appends and own-key
        // upserts commute, so a thread-safe map IS the oracle
        val model = new java.util.concurrent.ConcurrentHashMap[
          (String, Long), Long]()
        targets.foreach(t => (0L until nWriters.toLong)
          .foreach(k => model.put((t, k), k)))
        val commits = targets.map(t =>
          t -> new AtomicInteger(0)).toMap
        val raceWins = new AtomicInteger
        val errs = new ConcurrentLinkedQueue[Throwable]()
        val barrier = new CyclicBarrier(nWriters)
        val threads = (0 until nWriters).map { w =>
          val rnd = new scala.util.Random(seed * 100 + w)
          val t = new Thread(() => {
            try {
              barrier.await()
              (0 until 4).foreach { op =>
                val tgt = targets(rnd.nextInt(targets.size))
                val k = 1000L * (w + 1) + op
                rnd.nextInt(3) match {
                  case 0 => // fresh-key append into the writer's part
                    CommitLog.append(spark,
                      Seq((k, k, s"t$w")).toDF("k", "v", "pd"), tgt)
                    model.put((tgt, k), k)
                  case 1 => // keyed upsert confined to the writer's part
                    CommitLog.upsert(spark,
                      Seq((w.toLong, k, s"t$w")).toDF("k", "v", "pd"),
                      tgt, Seq("k"), "pd")
                    model.put((tgt, w.toLong), k)
                  case 2 => // COW delete of the writer's own keys — a
                    // no-match delete commits NOTHING (delete returns
                    // the current snapshot), so count only real hits
                    val mine = (1000L * (w + 1) until 1000L * (w + 1) + op)
                      .filter(dk => model.containsKey((tgt, dk)))
                    CommitLog.delete(spark, tgt,
                      col("k") >= 1000L * (w + 1) &&
                        col("k") < 1000L * (w + 1) + op)
                    mine.foreach(dk => model.remove((tgt, dk)))
                    if (mine.isEmpty) commits(tgt).decrementAndGet()
                }
                commits(tgt).incrementAndGet()
              }
              // every writer also races the SAME branch create: the
              // marker CAS must elect exactly one
              try {
                CommitLog.createBranch(spark, dir, s"race$seed")
                raceWins.incrementAndGet()
              } catch {
                // a LATE loser fails the pre-check (IAE), a
                // PHOTO-FINISH loser the marker CAS (ISE) — both mean
                // "someone else won", which is the property
                case e @ (_: IllegalStateException |
                          _: IllegalArgumentException)
                  if e.getMessage.contains("already exists") =>
              }
            } catch { case e: Throwable => errs.add(e) }
          })
          t.start(); t
        }
        threads.foreach(_.join(300000))
        assert(errs.isEmpty, s"seed $seed: storm writers failed: $errs")
        assert(raceWins.get() == 1,
          s"seed $seed: ${raceWins.get()} creators won the branch race")
        for (tgt <- targets) {
          // one version file per committed version, no gaps, no forks:
          // the CAS elected exactly one writer per number
          val head = CommitLog.latest(spark, tgt).get.version
          assert(head == baseVersion(tgt) + commits(tgt).get(),
            s"seed $seed: $tgt head $head != base ${baseVersion(tgt)} " +
              s"+ ${commits(tgt).get()} commits")
          // the domain's log replays to the model
          val got = CommitLog.read(spark, tgt)
            .select($"k", $"v").as[(Long, Long)].collect().toSet
          val want = model.entrySet().iterator().asScala
            .filter(_.getKey._1 == tgt)
            .map(e => (e.getKey._2, e.getValue)).toSet
          assert(got == want,
            s"seed $seed: $tgt diverged\nextra: ${got -- want}\n" +
              s"missing: ${want -- got}")
        }
        CommitLog.dropBranch(spark, dir, s"race$seed")
      } finally LogStore.unregister("file")
    }
  }
}

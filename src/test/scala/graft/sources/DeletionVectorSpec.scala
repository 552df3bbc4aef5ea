package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[CommitLog.deleteVectors]] (merge-on-read delete): tombstoned rows
  * must vanish from every read path with ZERO data files rewritten, the
  * vectors must ride time travel and restore, the metadata-plane exact
  * readers must decline rather than count tombstones, and compaction
  * must materialize the deletes and heal the metadata plane. */
class DeletionVectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshLake(statsCols: Seq[String] = Seq("k")): String = {
    val dir = Files.createTempDirectory("graft_dv_").toString + "/lake"
    spark.range(0, 900)
      .select($"id".as("k"), ($"id" % 90).as("v"),
        concat(lit("p"), ($"id" % 3).cast("long")).as("pd"))
      .repartition(4)
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir, statsCols = statsCols,
      sketchCols = Seq("v"), thetaCols = Seq("k"), thetaLgK = 12)
    dir
  }

  private def rows(dir: String): Set[(Long, Long, String)] =
    CommitLog.read(spark, dir).select($"k", $"v", $"pd")
      .as[(Long, Long, String)].collect().toSet

  test("MoR delete ≡ COW delete on every read path, with zero files rewritten") {
    val mor = freshLake()
    val cow = freshLake()
    val filesBefore = CommitLog.latest(spark, mor).get.files
    CommitLog.deleteVectors(spark, mor, $"v" >= 60)
    CommitLog.delete(spark, cow, $"v" >= 60)
    assert(rows(mor) == rows(cow), "MoR and COW must agree")
    assert(rows(mor).size == 600)
    // the headline: the MoR commit rewrote NOTHING
    assert(CommitLog.latest(spark, mor).get.files == filesBefore,
      "MoR delete must not touch a data file")
    assert(CommitLog.latest(spark, mor).get.dvs.size == 1)
    // a second MoR delete stacks cumulatively
    CommitLog.deleteVectors(spark, mor, $"v" < 10)
    assert(rows(mor).size == 500)
    assert(CommitLog.latest(spark, mor).get.dvs.size == 2)
    // null predicate deletes nothing; no-match is a version no-op
    val vNow = CommitLog.deleteVectors(spark, mor,
      $"v" < expr("cast(null as long)")).version
    assert(vNow == CommitLog.latest(spark, mor).get.version)
    assert(rows(mor).size == 500)
  }

  test("vectors ride time travel and restore") {
    val dir = freshLake()
    val v1 = CommitLog.latest(spark, dir).get.version
    val v2 = CommitLog.deleteVectors(spark, dir, $"k" < 300).version
    // pre-image intact, post-image filtered
    assert(CommitLog.readAt(spark, dir, v1).count() == 900L)
    assert(CommitLog.readAt(spark, dir, v2).count() == 600L)
    // an upsert on top; then restore back to the MoR version re-pins it
    CommitLog.upsert(spark,
      Seq((5000L, 1L, "p0")).toDF("k", "v", "pd"), dir, Seq("k"), "pd")
    CommitLog.restore(spark, dir, v2)
    assert(rows(dir).size == 600)
    assert(CommitLog.latest(spark, dir).get.dvs.nonEmpty)
  }

  test("upsert interop: the old-slice merge sees through the vectors") {
    val dir = freshLake()
    CommitLog.deleteVectors(spark, dir, $"k" < 30) // 30 rows, spread over pd
    // upsert touches p0 only; tombstoned p0 rows must NOT resurrect, and
    // p1/p2 vectors must keep filtering
    CommitLog.upsert(spark,
      Seq((300L, 999L, "p0")).toDF("k", "v", "pd"), dir, Seq("k"), "pd")
    val st = rows(dir)
    assert(!st.exists(_._1 < 30L), "tombstoned rows resurrected by upsert")
    assert(st.exists(r => r._1 == 300L && r._2 == 999L))
    assert(st.size == 900 - 30)
  }

  test("metadata-plane exact readers decline under vectors; compaction heals everything") {
    val dir = freshLake()
    CommitLog.deleteVectors(spark, dir, $"v" >= 45)
    for (probe <- Seq(
        () => CommitLog.statsAgg(spark, dir, Seq("k")),
        () => CommitLog.statsAggByPartition(spark, dir, Seq("k")),
        () => CommitLog.distinctAgg(spark, dir, Seq("k")))) {
      val e = intercept[IllegalArgumentException] { probe() }
      assert(e.getMessage.contains("deletion vectors"))
    }
    intercept[IllegalArgumentException] {
      CommitLog.quantiles(spark, dir, "v", Seq(0.5))
    }
    // compaction materializes: vectors cleared, rows physically gone,
    // the metadata plane answers again — with post-delete numbers
    CommitLog.compact(spark, dir, targetPartitions = 2)
    val snap = CommitLog.latest(spark, dir).get
    assert(snap.dvs.isEmpty)
    assert(rows(dir).size == 450)
    val r = CommitLog.statsAgg(spark, dir, Seq("k")).head
    assert(r.getAs[Long]("rows") == 450L)
    assert(CommitLog.distinctAgg(spark, dir, Seq("k"))
      .head.getLong(0) == 450L)
  }

  test("a table whose columns are literally named `file` and `pos` still MoR-deletes cleanly") {
    val dir = Files.createTempDirectory("graft_dv_names_").toString + "/lake"
    spark.range(0, 100)
      .select($"id".as("file"), ($"id" * 2).as("pos"),
        lit("a").as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
    CommitLog.deleteVectors(spark, dir, $"file" < 40)
    val out = CommitLog.read(spark, dir)
      .select($"file", $"pos").as[(Long, Long)].collect().toSet
    assert(out.size == 60 && out.forall(_._1 >= 40L),
      "DV anti-join must not collide with user columns named file/pos")
  }

  test("vacuum reclaims dropped vectors; a restore past them fails loudly") {
    val dir = freshLake()
    val vMor = CommitLog.deleteVectors(spark, dir, $"k" < 100).version
    CommitLog.compact(spark, dir, targetPartitions = 2)
    CommitLog.vacuum(spark, dir, keepLast = 1, staleStagingMs = 0L)
    val e = intercept[IllegalArgumentException] {
      CommitLog.restore(spark, dir, vMor)
    }
    // the version file itself was dropped with its vectors, so the guard
    // chain fires at resolution — any of the loud shapes is correct
    assert(e.getMessage.contains("deletion vector") ||
      e.getMessage.contains("reclaimed") ||
      e.getMessage.contains("vacuumed"))
    // and the dropped vector file is physically gone from the log dir
    val logDir = new java.io.File(s"$dir/_graft_log")
    assert(!logDir.listFiles.exists(_.getName.startsWith("dv-")),
      "dropped deletion-vector file must be reclaimed")
  }

  test("a writer staged before a MoR delete on its partition fails loudly " +
      "instead of rebasing over the tombstones") {
    val dir = freshLake()
    // stage an upsert into pd=p0 against the current base…
    val staged = CommitLog.stageUpsert(spark,
      Seq((0L, 999L, "p0")).toDF("k", "v", "pd"),
      dir, Seq("k"), "pd").get
    // …then a MoR delete lands on the SAME partition: no file changes,
    // only an appended vector. A file-diff-only clash check would wave
    // the rebase through and republish p0 from its pre-DV image.
    CommitLog.deleteVectors(spark, dir, $"pd" === "p0" && $"k" >= 600L)
    val e = intercept[IllegalStateException] {
      CommitLog.commitStaged(spark, dir, staged)
    }
    assert(e.getMessage.contains("conflict"), e.getMessage)
    assert(e.getMessage.contains("pd=p0"), e.getMessage)
    // the tombstones survived the attempt
    assert(!rows(dir).exists(r => r._3 == "p0" && r._1 >= 600L))
    // a DV on a DIFFERENT partition must NOT block the rebase
    val staged2 = CommitLog.stageUpsert(spark,
      Seq((1L, 998L, "p1")).toDF("k", "v", "pd"),
      dir, Seq("k"), "pd").get
    CommitLog.deleteVectors(spark, dir, $"pd" === "p2" && $"k" >= 800L)
    CommitLog.commitStaged(spark, dir, staged2)
    assert(rows(dir).contains((1L, 998L, "p1")))
  }

  test("changesBetween surfaces a MoR delete as the DV'd files' post-image") {
    val dir = freshLake()
    val v1 = CommitLog.latest(spark, dir).get.version
    // tombstone v >= 60 in pd=p0 only (k ≡ 0 mod 3 → pd=p0)
    val v2 = CommitLog.deleteVectors(spark, dir,
      $"pd" === "p0" && $"v" >= 60L).version
    val changed = CommitLog.changesBetween(spark, dir, v1, v2)
      .select($"k", $"v", $"pd").as[(Long, Long, String)].collect().toSet
    assert(changed.nonEmpty,
      "a MoR delete must not yield an empty change feed")
    // post-image of the touched files: surviving p0 rows only, no
    // tombstoned row, no untouched partition
    assert(changed.forall(_._3 == "p0"), "feed leaked untouched partitions")
    assert(changed.forall(_._2 < 60L), "feed emitted tombstoned rows")
    assert(changed == rows(dir).filter(_._3 == "p0"),
      "feed must be the touched partition's exact post-image")
    // a partition-replace consumer applying the feed converges: and a
    // range that ALSO rewrites the DV'd files later emits no stale image
    val v3 = CommitLog.upsert(spark,
      Seq((0L, 1L, "p0")).toDF("k", "v", "pd"),
      dir, Seq("k"), "pd").version
    val changed2 = CommitLog.changesBetween(spark, dir, v1, v3)
      .select($"k", $"v", $"pd").as[(Long, Long, String)].collect().toSet
    assert(changed2 == rows(dir).filter(_._3 == "p0"),
      "mixed DV+rewrite range must emit rows as of toV only")
  }
}

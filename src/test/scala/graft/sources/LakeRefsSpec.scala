package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.Constraints

/** [[LakeRefs]]: tags must be immutable, the published pointer must be
  * monotone and torn-write-safe, write-audit-publish must block a dirty
  * candidate without rollback, and vacuum must never reclaim a version a
  * ref still pins. */
class LakeRefsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshLake(): String = {
    val dir = Files.createTempDirectory("graft_refs_").toString + "/lake"
    spark.range(0, 100)
      .select($"id".as("k"), ($"id" % 10).as("v"),
        concat(lit("p"), ($"id" % 2).cast("long")).as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
    dir
  }

  private def upsertBatch(dir: String, lo: Long, hi: Long,
      v: Long): Long =
    CommitLog.upsert(spark,
      spark.range(lo, hi).select($"id".as("k"), lit(v).as("v"),
        concat(lit("p"), ($"id" % 2).cast("long")).as("pd")),
      dir, Seq("k"), "pd").version

  test("tags bind immutably and resolve; unknown tag fails loudly") {
    val dir = freshLake()
    val v2 = upsertBatch(dir, 0, 10, 77L)
    LakeRefs.tag(spark, dir, "train_v1", 1L)
    LakeRefs.tag(spark, dir, "train_v2", v2)
    assert(LakeRefs.tagVersion(spark, dir, "train_v1") == 1L)
    assert(LakeRefs.readTag(spark, dir, "train_v1")
      .filter($"v" === 77L).count() == 0L)
    assert(LakeRefs.readTag(spark, dir, "train_v2")
      .filter($"v" === 77L).count() == 10L)
    assert(LakeRefs.tags(spark, dir).map(_._1) == Seq("train_v1", "train_v2"))
    val e = intercept[IllegalStateException] {
      LakeRefs.tag(spark, dir, "train_v1", v2)
    }
    assert(e.getMessage.contains("immutable"))
    intercept[IllegalArgumentException] {
      LakeRefs.tagVersion(spark, dir, "nope")
    }
    // a tag cannot bind a version that never existed
    intercept[Exception] { LakeRefs.tag(spark, dir, "bad", 99L) }
  }

  test("published pointer: latest-until-first-publish, then only published is served; monotone") {
    val dir = freshLake()
    // never published → serves latest
    assert(LakeRefs.publishedVersion(spark, dir).isEmpty)
    assert(LakeRefs.readPublished(spark, dir).count() == 100L)
    LakeRefs.publish(spark, dir, 1L)
    val v2 = upsertBatch(dir, 200, 220, 1L)
    // v2 committed but unpublished: readPublished still serves v1
    assert(CommitLog.read(spark, dir).count() == 120L)
    assert(LakeRefs.readPublished(spark, dir).count() == 100L)
    LakeRefs.publish(spark, dir, v2)
    assert(LakeRefs.readPublished(spark, dir).count() == 120L)
    // monotone: republishing v1 aborts
    val e = intercept[IllegalStateException] { LakeRefs.publish(spark, dir, 1L) }
    assert(e.getMessage.contains("forward"))
  }

  test("a torn newest pointer file degrades to the previous publish") {
    val dir = freshLake()
    LakeRefs.publish(spark, dir, 1L)
    val v2 = upsertBatch(dir, 200, 210, 1L)
    LakeRefs.publish(spark, dir, v2)
    // simulate a crash mid-create of the NEXT pointer: an empty p-file
    val pubDir = new java.io.File(s"$dir/_graft_log/refs/published")
    val torn = new java.io.File(pubDir, f"p${3L}%020d.json")
    assert(torn.createNewFile())
    assert(LakeRefs.publishedVersion(spark, dir).contains(v2))
    assert(LakeRefs.readPublished(spark, dir).count() == 110L)
  }

  test("publishAudited blocks a dirty candidate and publishes a clean one") {
    val dir = freshLake()
    LakeRefs.publish(spark, dir, 1L)
    // bad batch: negative v values violate Bounds
    val vBad = upsertBatch(dir, 300, 310, -5L)
    val (okBad, reportBad) = LakeRefs.publishAudited(spark, dir, vBad,
      Seq(Constraints.Bounds("v", 0, 1000)))
    assert(!okBad)
    assert(reportBad.filter($"violations" > 0).count() == 1L)
    assert(LakeRefs.publishedVersion(spark, dir).contains(1L),
      "blocked publish must not move the pointer")
    // good batch on top — no rollback needed, publish moves past the bad one
    val vGood = upsertBatch(dir, 300, 310, 55L)
    val (okGood, _) = LakeRefs.publishAudited(spark, dir, vGood,
      Seq(Constraints.Bounds("v", 0, 1000)))
    assert(okGood)
    assert(LakeRefs.publishedVersion(spark, dir).contains(vGood))
    assert(LakeRefs.readPublished(spark, dir)
      .filter($"v" === 55L).count() == 10L)
  }

  test("vacuum keeps ref-pinned versions readable; unpinned history drops") {
    val dir = freshLake()
    val v2 = upsertBatch(dir, 0, 10, 101L)
    val v3 = upsertBatch(dir, 0, 10, 102L)
    val v4 = upsertBatch(dir, 0, 10, 103L)
    LakeRefs.tag(spark, dir, "anchor", v2)
    LakeRefs.publish(spark, dir, v3)
    CommitLog.vacuum(spark, dir, keepLast = 1, staleStagingMs = 0L)
    // v1 (unpinned) is gone; v2 (tag), v3 (published), v4 (latest) live
    intercept[Exception] { CommitLog.readAt(spark, dir, 1L).count() }
    assert(CommitLog.readAt(spark, dir, v2)
      .filter($"v" === 101L).count() == 10L)
    assert(LakeRefs.readTag(spark, dir, "anchor")
      .filter($"v" === 101L).count() == 10L)
    assert(LakeRefs.readPublished(spark, dir)
      .filter($"v" === 102L).count() == 10L)
    assert(CommitLog.readAt(spark, dir, v4)
      .filter($"v" === 103L).count() == 10L)
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** RENAME/DROP COLUMN as metadata-only commits: the physical-name
  * mapping ([[CommitLog.Snapshot.physNames]]/`retired`) must keep every
  * verb correct — reads alias back, writes stage under birth names,
  * DVs and compaction survive, and dropped bytes can never resurrect. */
class ColumnMappingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshLake(): String = {
    val dir = Files.createTempDirectory("graft_cm_").toString + "/lake"
    spark.range(0, 100)
      .select($"id".as("k"), ($"id" * 2).as("v"),
        concat(lit("p"), ($"id" % 2)).as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
    dir
  }

  test("rename: zero files touched; reads, upserts, deletes, compaction " +
    "all see the new name; old files keep the birth name") {
    val dir = freshLake()
    val filesBefore = CommitLog.latest(spark, dir).get.files
    CommitLog.renameColumn(spark, dir, "v", "score")
    val s = CommitLog.latest(spark, dir).get
    assert(s.files == filesBefore, "rename is a zero-file commit")
    assert(s.physNames == Map("score" -> "v"))
    assert(CommitLog.read(spark, dir).columns.toSeq == Seq("k", "score", "pd"))
    assert(CommitLog.read(spark, dir).agg(sum($"score")).as[Long].head() ==
      (0L until 100L).map(_ * 2).sum)

    // upsert under the NEW name merges against old-file rows
    val upd = Seq((1L, 999L, "p1")).toDF("k", "score", "pd")
    CommitLog.upsert(spark, upd, dir, Seq("k"), "pd")
    assert(CommitLog.read(spark, dir).filter($"k" === 1).select($"score")
      .as[Long].head() == 999L)

    // COW delete rewrites survivors — still under birth name on disk
    CommitLog.delete(spark, dir, $"score" > 150 && $"k" =!= 1)
    assert(CommitLog.read(spark, dir)
      .filter($"score" > 150 && $"k" =!= 1).count() == 0L)

    // MoR delete evaluates the logical condition
    CommitLog.deleteVectors(spark, dir, $"score" === 10L)
    assert(CommitLog.read(spark, dir).filter($"k" === 5).count() == 0L)

    // compaction round-trips the mapping
    CommitLog.compact(spark, dir, 2)
    assert(CommitLog.read(spark, dir).columns.toSeq == Seq("k", "score", "pd"))
    assert(CommitLog.read(spark, dir).filter($"k" === 1).select($"score")
      .as[Long].head() == 999L)

    // time travel renders each version's OWN schema
    assert(CommitLog.readAt(spark, dir, 1).columns.toSeq == Seq("k", "v", "pd"))
  }

  test("rename guards: anchored columns and collisions rejected") {
    val dir = freshLake()
    intercept[IllegalArgumentException] {
      CommitLog.renameColumn(spark, dir, "pd", "part") // partition col
    }
    intercept[IllegalArgumentException] {
      CommitLog.renameColumn(spark, dir, "k", "v") // name taken
    }
    intercept[IllegalArgumentException] {
      CommitLog.renameColumn(spark, dir, "missing", "x")
    }
    val sdir = Files.createTempDirectory("graft_cm_s_").toString + "/lake"
    spark.range(0, 10).select($"id".as("a"), $"id".as("b"))
      .write.parquet(sdir)
    CommitLog.init(spark, sdir, statsCols = Seq("a"))
    intercept[IllegalArgumentException] {
      CommitLog.renameColumn(spark, sdir, "a", "c") // zone-map anchored
    }
  }

  test("drop + re-add cannot resurrect; implicit evolution of a retired " +
    "name is rejected; rename-away then add reuses no physical name") {
    val dir = freshLake()
    CommitLog.dropColumn(spark, dir, "v")
    assert(CommitLog.read(spark, dir).columns.toSeq == Seq("k", "pd"))
    assert(CommitLog.latest(spark, dir).get.retired == Seq("v"))

    // implicit (write-side) evolution with the retired name → loud no
    val bad = Seq((500L, 1L, "p0")).toDF("k", "v", "pd")
    val e = intercept[IllegalArgumentException] {
      CommitLog.append(spark, bad, dir)
    }
    assert(e.getMessage.contains("ADD COLUMNS"))

    // explicit re-add mints a fresh physical name → nulls, not old bytes
    CommitLog.addColumns(spark, dir, org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType))))
    val s = CommitLog.latest(spark, dir).get
    assert(s.physNames.keySet == Set("v") && s.physNames("v") != "v")
    assert(CommitLog.read(spark, dir).filter($"v".isNotNull).count() == 0L,
      "re-added column must be all-null")
    // and writes to the re-added column round-trip through the mint
    val upd = Seq((3L, 77L, "p1")).toDF("k", "v", "pd")
    CommitLog.upsert(spark, upd, dir, Seq("k"), "pd")
    assert(CommitLog.read(spark, dir).filter($"k" === 3).select($"v")
      .as[(Option[Long])].head().contains(77L))

    // rename-away then implicit add of the birth name is also rejected
    val dir2 = freshLake()
    CommitLog.renameColumn(spark, dir2, "v", "score")
    val bad2 = spark.range(0, 1)
      .select($"id".as("k"), ($"id").as("score"), lit("p0").as("pd"),
        lit(7L).as("v"))
    val e2 = intercept[IllegalArgumentException] {
      CommitLog.append(spark, bad2, dir2)
    }
    assert(e2.getMessage.contains("ADD COLUMNS"))
  }

  test("change feed ACROSS a rename boundary: the renamed column is the " +
    "same column, not drop+add — untouched rows stay silent") {
    val dir = freshLake()
    val v1 = CommitLog.latest(spark, dir).get.version
    CommitLog.renameColumn(spark, dir, "v", "score")
    val upd = Seq((7L, 70707L, "p1")).toDF("k", "score", "pd")
    val v3 = CommitLog.upsert(spark, upd, dir, Seq("k"), "pd").version
    val cdf = CommitLog.changeFeed(spark, dir, v1, v3, Seq("k"))
      .select($"_change_type", $"k", $"score")
      .as[(String, Long, Long)].collect().toSet
    assert(cdf == Set(
      ("update_preimage", 7L, 14L), ("update_postimage", 7L, 70707L)),
      "rename inside the range must not flag untouched rows")
  }

  test("change feed and SQL DML keep working after a rename") {
    val dir = freshLake()
    CommitLog.renameColumn(spark, dir, "v", "score")
    val v1 = CommitLog.latest(spark, dir).get.version
    spark.sql(s"UPDATE graft_lake('$dir') SET score = 0 WHERE k < 3")
    val v2 = CommitLog.latest(spark, dir).get.version
    val cdf = CommitLog.changeFeed(spark, dir, v1, v2, Seq("k"))
      .filter($"_change_type" === "update_postimage")
      .select($"k", $"score").as[(Long, Long)].collect().toSet
    // k=0 already held score 0 — the value-unchanged republish is
    // correctly suppressed by the feed
    assert(cdf == Set((1L, 0L), (2L, 0L)))
    assert(spark.sql(s"SELECT sum(score) s FROM graft_lake('$dir')")
      .as[Long].head() ==
      (3L until 100L).map(_ * 2).sum)
  }
}

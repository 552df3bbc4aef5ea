package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TYPE WIDENING as schema evolution: both the explicit DDL
  * ([[CommitLog.alterColumnType]]) and the implicit write-side path
  * (a wider incoming type widens the committed schema) are zero-file
  * commits — existing files keep the narrow physical type and the
  * parquet scan upcasts exactly. Off-lattice changes and anchored
  * columns reject loudly. */
class TypeWideningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshLake(): String = {
    val dir = Files.createTempDirectory("graft_tw_").toString + "/lake"
    spark.range(0, 100)
      .select($"id".as("k"),
        ($"id" % 1000).cast("int").as("v"),
        ($"id" % 7).cast("float").as("f"),
        concat(lit("p"), ($"id" % 2)).as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
    dir
  }

  test("explicit ALTER COLUMN TYPE: zero files, exact upcast reads, " +
    "post-widen writes carry the wide type") {
    val dir = freshLake()
    val filesBefore = CommitLog.latest(spark, dir).get.files
    CommitLog.alterColumnType(spark, dir, "v", LongType)
    CommitLog.alterColumnType(spark, dir, "f", DoubleType)
    val s = CommitLog.latest(spark, dir).get
    assert(s.files == filesBefore, "widening is a zero-file commit")
    val df = CommitLog.read(spark, dir)
    assert(df.schema("v").dataType == LongType)
    assert(df.schema("f").dataType == DoubleType)
    // values exact through the upcast
    assert(df.agg(sum($"v")).as[Long].head() ==
      (0L until 100L).map(_ % 1000).sum)
    assert(df.filter($"k" === 8).select($"f").as[Double].head() == 1.0)
    // a write carrying the WIDE type appends cleanly
    val wide = Seq((500L, 5000000000L, 1.5, "p0")).toDF("k", "v", "f", "pd")
    CommitLog.append(spark, wide, dir)
    assert(CommitLog.read(spark, dir).filter($"k" === 500)
      .select($"v").as[Long].head() == 5000000000L)
    // a write still carrying the NARROW type also lands (upcast on read)
    val narrow = spark.range(600, 601).select($"id".as("k"),
      lit(7).cast("int").as("v"), lit(0.5f).as("f"), lit("p1").as("pd"))
    CommitLog.append(spark, narrow, dir)
    assert(CommitLog.read(spark, dir).filter($"k" === 600)
      .select($"v").as[Long].head() == 7L)
    // time travel renders the version's OWN (narrow) schema
    assert(CommitLog.readAt(spark, dir, 1).schema("v").dataType ==
      IntegerType)
  }

  test("implicit widening: a write with a wider type widens the schema") {
    val dir = freshLake()
    val wide = Seq((700L, 6000000000L, 2.5f, "p0")).toDF("k", "v", "f", "pd")
    CommitLog.append(spark, wide, dir)
    val df = CommitLog.read(spark, dir)
    assert(df.schema("v").dataType == LongType,
      "the committed schema must widen with the write")
    assert(df.filter($"k" === 700).select($"v").as[Long].head() ==
      6000000000L)
    assert(df.filter($"k" === 1).select($"v").as[Long].head() == 1L,
      "old narrow files upcast exactly")
  }

  test("guards: off-lattice changes, anchored columns, unknown columns") {
    val dir = freshLake()
    intercept[IllegalArgumentException] {
      CommitLog.alterColumnType(spark, dir, "v", StringType) // off-lattice
    }
    CommitLog.alterColumnType(spark, dir, "v", LongType)
    intercept[IllegalArgumentException] {
      CommitLog.alterColumnType(spark, dir, "v", IntegerType) // narrowing
    }
    intercept[IllegalArgumentException] {
      CommitLog.alterColumnType(spark, dir, "missing", LongType)
    }
    val sdir = Files.createTempDirectory("graft_tw_s_").toString + "/lake"
    spark.range(0, 10).select($"id".cast("int").as("a"), $"id".as("b"))
      .write.parquet(sdir)
    CommitLog.init(spark, sdir, statsCols = Seq("a"))
    intercept[IllegalArgumentException] {
      CommitLog.alterColumnType(spark, sdir, "a", LongType) // zone-mapped
    }
    // the implicit path refuses the same anchored widening
    intercept[IllegalArgumentException] {
      CommitLog.append(spark,
        spark.range(0, 1).select($"id".as("a"), $"id".as("b")), sdir)
    }
  }

  test("SQL surface: ALTER COLUMN TYPE on TVF and catalog targets") {
    val dir = freshLake()
    spark.sql(s"ALTER TABLE graft_lake('$dir') ALTER COLUMN v TYPE BIGINT")
    assert(CommitLog.read(spark, dir).schema("v").dataType == LongType)
    spark.sql(s"INSERT INTO graft_lake('$dir') VALUES " +
      "(800, 7000000000, 0.25, 'p0')")
    assert(spark.sql(s"SELECT v FROM graft_lake('$dir') WHERE k = 800")
      .as[Long].head() == 7000000000L)
    // catalog-name route (TableChange.UpdateColumnType)
    val wh = Files.createTempDirectory("graft_tw_wh_").toString
    spark.conf.set("spark.sql.catalog.gtw",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtw.warehouse", wh)
    spark.sql("CREATE NAMESPACE gtw.db")
    spark.sql("CREATE TABLE gtw.db.t (k BIGINT, v INT)")
    spark.sql("INSERT INTO gtw.db.t VALUES (1, 5)")
    spark.sql("ALTER TABLE gtw.db.t ALTER COLUMN v TYPE BIGINT")
    spark.sql("INSERT INTO gtw.db.t VALUES (2, 8000000000)")
    assert(spark.sql("SELECT sum(v) s FROM gtw.db.t").as[Long].head() ==
      8000000005L)
  }

  test("change feed across a widen boundary diffs exactly") {
    val dir = freshLake()
    val v1 = CommitLog.latest(spark, dir).get.version
    CommitLog.alterColumnType(spark, dir, "v", LongType)
    val upd = Seq((3L, 9000000000L, 3.0f.toDouble, "p1"))
      .toDF("k", "v", "f", "pd")
      .select($"k", $"v", $"f".cast("float").as("f"), $"pd")
    val v3 = CommitLog.upsert(spark, upd, dir, Seq("k"), "pd").version
    val cdf = CommitLog.changeFeed(spark, dir, v1, v3, Seq("k"))
      .select($"_change_type", $"k", $"v").as[(String, Long, Long)]
      .collect().toSet
    assert(cdf == Set(("update_preimage", 3L, 3L),
      ("update_postimage", 3L, 9000000000L)),
      "only the touched row may appear — the widen is not churn")
  }
}

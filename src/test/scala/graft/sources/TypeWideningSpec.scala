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

  test("decimal lattice edges: int->decimal, long->decimal(>=20), " +
    "decimal->wider decimal; unsafe decimal shapes reject") {
    val dir = Files.createTempDirectory("graft_tw_dec_").toString + "/lake"
    spark.range(0, 50)
      .select($"id".as("k"), ($"id" % 90 + 10).cast("int").as("v"),
        (($"id" % 900) + lit(0.25)).cast("decimal(10,2)").as("amt"),
        lit("p0").as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
    val filesBefore = CommitLog.latest(spark, dir).get.files
    CommitLog.alterColumnType(spark, dir, "v", DecimalType(12, 2))
    CommitLog.alterColumnType(spark, dir, "amt", DecimalType(16, 4))
    assert(CommitLog.latest(spark, dir).get.files == filesBefore,
      "decimal widening is a zero-file commit")
    val df = CommitLog.read(spark, dir)
    assert(df.schema("v").dataType == DecimalType(12, 2))
    assert(df.schema("amt").dataType == DecimalType(16, 4))
    // int-stored and decimal(10,2)-stored files upcast value-exactly
    assert(df.agg(sum($"v")).head().getDecimal(0).longValue ==
      (0L until 50L).map(_ % 90 + 10).sum)
    assert(df.filter($"k" === 3).select($"amt").head().getDecimal(0)
      .toString == "3.2500")
    // a write needing the wide types lands and reads back
    CommitLog.append(spark, Seq((500L, BigDecimal("9999999999.99"),
      BigDecimal("123456789012.3456"), "p0")).toDF("k", "v", "amt", "pd")
      .select($"k", $"v".cast("decimal(12,2)").as("v"),
        $"amt".cast("decimal(16,4)").as("amt"), $"pd"), dir)
    assert(CommitLog.read(spark, dir).filter($"k" === 500)
      .select($"v").head().getDecimal(0).toString == "9999999999.99")
    // long needs >= 20 integer digits; int needs >= 10; decimal cannot
    // lose scale or integer digits
    val d2 = Files.createTempDirectory("graft_tw_dec2_").toString + "/lake"
    spark.range(0, 5).select($"id".as("k"), $"id".as("big"),
      $"id".cast("decimal(10,4)").as("m"), lit("p0").as("pd"))
      .write.partitionBy("pd").parquet(d2)
    CommitLog.init(spark, d2)
    intercept[IllegalArgumentException] {
      CommitLog.alterColumnType(spark, d2, "big", DecimalType(19, 0))
    }
    CommitLog.alterColumnType(spark, d2, "big", DecimalType(22, 2))
    intercept[IllegalArgumentException] {
      CommitLog.alterColumnType(spark, d2, "m", DecimalType(12, 2)) // -scale
    }
    intercept[IllegalArgumentException] {
      CommitLog.alterColumnType(spark, d2, "m", DecimalType(11, 6)) // -int
    }
    CommitLog.alterColumnType(spark, d2, "m", DecimalType(12, 6))
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

package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.CommitLog

/** The graft TableCatalog: the full SQL lifecycle on CATALOG-QUALIFIED
  * names — CREATE NAMESPACE/TABLE/CTAS, INSERT (INTO/OVERWRITE),
  * DELETE/UPDATE/MERGE, native VERSION AS OF, ALTER TABLE
  * ADD/RENAME/DROP COLUMN, SHOW/DESCRIBE/DROP — with every verb landing
  * the same CommitLog commits as the Scala API and the graft_lake()
  * TVFs. */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One catalog instance for the suite: the CatalogManager caches the
    * plugin per name after first use, so the warehouse is fixed here. */
  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_cat_wh_").toString
    spark.conf.set("spark.sql.catalog.gcat",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", dir)
    spark.sql("CREATE NAMESPACE gcat.db")
    dir
  }

  private def rows(t: String): Set[(Long, Long, String)] =
    spark.sql(s"SELECT k, v, pd FROM $t").as[(Long, Long, String)]
      .collect().toSet

  test("CREATE TABLE + INSERT INTO + SELECT by name — the catalog core") {
    wh
    spark.sql("CREATE TABLE gcat.db.t1 (k BIGINT, v BIGINT, pd STRING) " +
      "PARTITIONED BY (pd) TBLPROPERTIES ('graft.statscols' = 'k')")
    // fresh table: empty read under the declared schema
    assert(spark.sql("SELECT * FROM gcat.db.t1").columns.toSeq ==
      Seq("k", "v", "pd"))
    assert(spark.sql("SELECT * FROM gcat.db.t1").count() == 0L)
    spark.sql("INSERT INTO gcat.db.t1 " +
      "SELECT id, id * 10, concat('p', id % 3) FROM range(0, 30)")
    assert(rows("gcat.db.t1") ==
      (0L until 30L).map(i => (i, i * 10, s"p${i % 3}")).toSet)
    // the commit is a real CommitLog commit: the TVF reads the same lake
    val dir = s"$wh/db/t1"
    assert(CommitLog.read(spark, dir).count() == 30L)
    assert(spark.sql(s"SELECT count(*) c FROM graft_lake('$dir')")
      .as[Long].head() == 30L)
    // declared stats column is live (create carried statsCols)
    assert(CommitLog.latest(spark, dir).get.statsCols == Seq("k"))
    // hive layout: partition dirs from the declared PARTITIONED BY
    assert(CommitLog.latest(spark, dir).get.files.forall(_.startsWith("pd=")))
  }

  test("catalog DML: UPDATE / DELETE / MERGE on catalog-qualified names") {
    wh
    spark.sql("CREATE TABLE gcat.db.t2 (k BIGINT, v BIGINT, pd STRING) " +
      "PARTITIONED BY (pd)")
    spark.sql("INSERT INTO gcat.db.t2 " +
      "SELECT id, id, concat('p', id % 2) FROM range(0, 20)")
    spark.sql("UPDATE gcat.db.t2 SET v = v + 100 WHERE k < 5")
    spark.sql("DELETE FROM gcat.db.t2 WHERE k >= 15")
    spark.sql("MERGE INTO gcat.db.t2 AS t USING (SELECT 3L AS k, " +
      "999L AS v, 'p1' AS pd UNION ALL SELECT 40L, 40L, 'p0') AS s " +
      "ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val expect = (0L until 15L).map {
      case 3L => (3L, 999L, "p1")
      case i if i < 5 => (i, i + 100, s"p${i % 2}")
      case i => (i, i, s"p${i % 2}")
    }.toSet + ((40L, 40L, "p0"))
    assert(rows("gcat.db.t2") == expect)
    // MoR delete with the deletion-vector suffix on a catalog name
    val filesBefore = CommitLog.latest(spark, s"$wh/db/t2").get.files
    spark.sql("DELETE FROM gcat.db.t2 WHERE k = 40 USING DELETION VECTORS")
    assert(CommitLog.latest(spark, s"$wh/db/t2").get.files == filesBefore)
    assert(rows("gcat.db.t2") == expect - ((40L, 40L, "p0")))
  }

  test("native VERSION AS OF / TIMESTAMP AS OF grammar time-travels") {
    wh
    spark.sql("CREATE TABLE gcat.db.t3 (k BIGINT, v BIGINT, pd STRING) " +
      "PARTITIONED BY (pd)")
    spark.sql("INSERT INTO gcat.db.t3 SELECT id, id, 'p0' FROM range(0, 5)")
    val v2 = CommitLog.latest(spark, s"$wh/db/t3").get
    spark.sql("DELETE FROM gcat.db.t3 WHERE k < 3")
    assert(spark.sql("SELECT count(*) c FROM gcat.db.t3").as[Long].head() == 2L)
    assert(spark.sql(
      s"SELECT count(*) c FROM gcat.db.t3 VERSION AS OF ${v2.version}")
      .as[Long].head() == 5L)
    val ts = java.time.Instant.ofEpochMilli(v2.committedAt).toString
    assert(spark.sql(
      s"SELECT count(*) c FROM gcat.db.t3 TIMESTAMP AS OF '$ts'")
      .as[Long].head() == 5L)
    // a TAG name resolves through the lake's refs in the same grammar
    graft.sources.LakeRefs.tag(spark, s"$wh/db/t3", "pre-delete",
      v2.version)
    assert(spark.sql(
      "SELECT count(*) c FROM gcat.db.t3 VERSION AS OF 'pre-delete'")
      .as[Long].head() == 5L)
  }

  test("ALTER TABLE ADD / RENAME / DROP COLUMN — zero-file DDL commits") {
    wh
    spark.sql("CREATE TABLE gcat.db.t4 (k BIGINT, v BIGINT, pd STRING) " +
      "PARTITIONED BY (pd)")
    spark.sql("INSERT INTO gcat.db.t4 SELECT id, id * 2, 'p0' FROM range(0, 10)")
    val dir = s"$wh/db/t4"
    val filesBefore = CommitLog.latest(spark, dir).get.files

    spark.sql("ALTER TABLE gcat.db.t4 ADD COLUMNS (note STRING)")
    assert(spark.sql("SELECT note FROM gcat.db.t4 WHERE k = 1")
      .collect().head.isNullAt(0))

    // RENAME: metadata-only — old data readable under the NEW name
    spark.sql("ALTER TABLE gcat.db.t4 RENAME COLUMN v TO score")
    assert(CommitLog.latest(spark, dir).get.files == filesBefore,
      "rename must touch zero data files")
    assert(spark.sql("SELECT sum(score) s FROM gcat.db.t4").as[Long].head() ==
      (0L until 10L).map(_ * 2).sum)
    // writes after the rename carry the new logical name
    spark.sql("INSERT INTO gcat.db.t4 VALUES (100, 7, 'p0', 'x')")
    assert(spark.sql("SELECT score FROM gcat.db.t4 WHERE k = 100")
      .as[Long].head() == 7L)
    // DML through the renamed name
    spark.sql("UPDATE gcat.db.t4 SET score = score + 1 WHERE k = 100")
    assert(spark.sql("SELECT score FROM gcat.db.t4 WHERE k = 100")
      .as[Long].head() == 8L)
    // time travel renders the OLD schema for old versions
    assert(spark.sql("SELECT * FROM gcat.db.t4 VERSION AS OF 2")
      .columns.toSeq == Seq("k", "v", "pd"))

    // DROP: logical removal; re-ADD of the same name must NOT resurrect
    spark.sql("ALTER TABLE gcat.db.t4 DROP COLUMN note")
    assert(spark.sql("SELECT * FROM gcat.db.t4").columns.toSeq ==
      Seq("k", "score", "pd"))
    spark.sql("ALTER TABLE gcat.db.t4 ADD COLUMNS (note STRING)")
    assert(spark.sql("SELECT note FROM gcat.db.t4 WHERE k = 100")
      .collect().head.isNullAt(0),
      "re-added column must read null, not the dropped column's bytes")
  }

  test("INSERT OVERWRITE and CTAS") {
    wh
    spark.sql("CREATE TABLE gcat.db.t5 (k BIGINT, v BIGINT, pd STRING) " +
      "PARTITIONED BY (pd)")
    spark.sql("INSERT INTO gcat.db.t5 SELECT id, id, 'p0' FROM range(0, 10)")
    spark.sql("INSERT OVERWRITE gcat.db.t5 SELECT id, id, 'p1' FROM range(0, 3)")
    assert(rows("gcat.db.t5") == (0L until 3L).map(i => (i, i, "p1")).toSet)

    spark.sql("CREATE TABLE gcat.db.t6 AS " +
      "SELECT k, v * 10 AS v, pd FROM gcat.db.t5")
    assert(rows("gcat.db.t6") == (0L until 3L).map(i => (i, i * 10, "p1")).toSet)
    assert(CommitLog.latest(spark, s"$wh/db/t6").isDefined)
  }

  test("SHOW CREATE TABLE renders the v2 metadata (schema, partitioning, " +
    "location)") {
    wh
    spark.sql("CREATE TABLE gcat.db.t16 (k BIGINT, v DOUBLE, pd STRING) " +
      "PARTITIONED BY (pd)")
    val ddl = spark.sql("SHOW CREATE TABLE gcat.db.t16")
      .collect().head.getString(0)
    assert(ddl.contains("k BIGINT") && ddl.contains("v DOUBLE"))
    assert(ddl.contains("PARTITIONED BY (pd)"))
    assert(ddl.contains(s"LOCATION '$wh/db/t16'"))
  }

  test("SHOW TABLES / DESCRIBE / RENAME / DROP TABLE metadata verbs") {
    wh
    spark.sql("CREATE TABLE gcat.db.t7 (a BIGINT, b STRING)")
    val shown = spark.sql("SHOW TABLES IN gcat.db")
      .select("tableName").as[String].collect().toSet
    assert(shown.contains("t7"))
    val desc = spark.sql("DESCRIBE TABLE gcat.db.t7")
      .select("col_name", "data_type").as[(String, String)].collect().toMap
    assert(desc("a") == "bigint" && desc("b") == "string")
    spark.sql("ALTER TABLE gcat.db.t7 RENAME TO gcat.db.t7b")
    assert(spark.catalog.tableExists("gcat.db.t7b"))
    assert(!spark.catalog.tableExists("gcat.db.t7"))
    spark.sql("DROP TABLE gcat.db.t7b")
    assert(!spark.catalog.tableExists("gcat.db.t7b"))
  }

  test("CTAS with PARTITIONED BY lands a hive-partitioned lake; INSERT " +
    "with a column list binds by name and nulls the rest") {
    wh
    spark.sql("CREATE TABLE gcat.db.t12 PARTITIONED BY (pd) AS " +
      "SELECT id AS k, id * 2 AS v, concat('p', id % 2) AS pd " +
      "FROM range(0, 10)")
    val snap = CommitLog.latest(spark, s"$wh/db/t12").get
    assert(snap.files.forall(_.startsWith("pd=")),
      "CTAS partitioning must reach the lake layout")
    assert(rows("gcat.db.t12") ==
      (0L until 10L).map(i => (i, i * 2, s"p${i % 2}")).toSet)
    // column-list INSERT: Spark resolves by name and fills the rest
    spark.sql("ALTER TABLE gcat.db.t12 ADD COLUMNS (note STRING)")
    spark.sql("INSERT INTO gcat.db.t12 (k, v, pd) VALUES (100, 7, 'p0')")
    val r = spark.sql(
      "SELECT v, note FROM gcat.db.t12 WHERE k = 100").collect().head
    assert(r.getLong(0) == 7L && r.isNullAt(1))
  }

  test("self-join and aggregate read through the relation swap") {
    wh
    spark.sql("CREATE TABLE gcat.db.t8 (k BIGINT, v BIGINT, pd STRING)")
    spark.sql("INSERT INTO gcat.db.t8 SELECT id, id % 4, 'p' FROM range(0, 40)")
    val got = spark.sql(
      "SELECT a.v AS v, count(*) AS c FROM gcat.db.t8 a " +
        "JOIN gcat.db.t8 b ON a.k = b.k GROUP BY a.v ORDER BY v")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 10L), (1L, 10L), (2L, 10L), (3L, 10L)))
  }

  test("INSERT OVERWRITE with a static PARTITION spec is an atomic " +
    "replaceWhere: only that partition changes") {
    wh
    spark.sql("CREATE TABLE gcat.db.t15 (k BIGINT, v BIGINT, pd STRING) " +
      "PARTITIONED BY (pd)")
    spark.sql("INSERT INTO gcat.db.t15 SELECT id, id, concat('p', id % 2) " +
      "FROM range(0, 20)")
    val p0Before = CommitLog.latest(spark, s"$wh/db/t15").get.files
      .filter(_.startsWith("pd=p0")).toSet
    spark.sql("INSERT OVERWRITE gcat.db.t15 PARTITION (pd = 'p1') " +
      "SELECT id + 100, id FROM range(0, 3)")
    val got = rows("gcat.db.t15")
    val expect = (0L until 20L by 2).map(i => (i, i, "p0")).toSet ++
      (0L until 3L).map(i => (i + 100, i, "p1"))
    assert(got == expect, "only pd=p1 may be replaced")
    assert(CommitLog.latest(spark, s"$wh/db/t15").get.files
      .filter(_.startsWith("pd=p0")).toSet == p0Before,
      "untouched partition files must be byte-identical (COW pruning)")
  }

  test("DML with 1-/2-part names under USE <catalog>") {
    wh
    spark.sql("CREATE TABLE gcat.db.t14 (k BIGINT, v BIGINT, pd STRING) " +
      "PARTITIONED BY (pd)")
    spark.sql("INSERT INTO gcat.db.t14 SELECT id, id, 'p0' FROM range(0, 10)")
    try {
      spark.sql("USE gcat")
      spark.sql("UPDATE db.t14 SET v = v + 100 WHERE k < 2")
      spark.sql("USE gcat.db")
      spark.sql("DELETE FROM t14 WHERE k >= 8")
      assert(spark.sql("SELECT sum(v) s FROM t14").as[Long].head() ==
        (0L until 8L).map(k => if (k < 2) k + 100 else k).sum)
    } finally spark.sql("USE spark_catalog")
  }

  test("TRUNCATE TABLE empties the snapshot; history stays travelable") {
    wh
    spark.sql("CREATE TABLE gcat.db.t13 (k BIGINT, pd STRING) " +
      "PARTITIONED BY (pd)")
    spark.sql("INSERT INTO gcat.db.t13 SELECT id, concat('p', id % 2) " +
      "FROM range(0, 20)")
    val vBefore = CommitLog.latest(spark, s"$wh/db/t13").get.version
    spark.sql("TRUNCATE TABLE gcat.db.t13")
    assert(spark.sql("SELECT count(*) c FROM gcat.db.t13")
      .as[Long].head() == 0L)
    assert(spark.sql("SELECT * FROM gcat.db.t13").columns.toSeq ==
      Seq("k", "pd"), "schema survives the truncate")
    assert(spark.sql(
      s"SELECT count(*) c FROM gcat.db.t13 VERSION AS OF $vBefore")
      .as[Long].head() == 20L)
    // the table accepts writes again
    spark.sql("INSERT INTO gcat.db.t13 VALUES (99, 'p1')")
    assert(spark.sql("SELECT count(*) c FROM gcat.db.t13")
      .as[Long].head() == 1L)
  }

  test("TVFs and CALL maintenance verbs address catalog tables by name") {
    wh
    spark.sql("CREATE TABLE gcat.db.t10 (k BIGINT, v BIGINT, pd STRING) " +
      "PARTITIONED BY (pd)")
    spark.sql("INSERT INTO gcat.db.t10 SELECT id, id, concat('p', id % 2) " +
      "FROM range(0, 20)")
    spark.sql("DELETE FROM gcat.db.t10 WHERE k >= 10")
    // read TVFs by catalog-qualified name
    assert(spark.sql("SELECT count(*) c FROM graft_lake('gcat.db.t10')")
      .as[Long].head() == 10L)
    assert(spark.sql("SELECT count(*) c FROM graft_lake_history('gcat.db.t10')")
      .as[Long].head() >= 3L)
    val cdf = spark.sql(
      "SELECT _change_type, count(*) c FROM " +
        "graft_lake_cdf('gcat.db.t10', 2, 3, 'k') GROUP BY 1")
      .as[(String, Long)].collect().toMap
    assert(cdf == Map("delete" -> 10L))
    // CALL maintenance verbs by name
    val out = spark.sql("CALL graft_compact('gcat.db.t10', 1)").collect()
    assert(out.head.getString(1) == "compact")
    assert(spark.sql("SELECT count(*) c FROM gcat.db.t10")
      .as[Long].head() == 10L)
    spark.sql("CALL graft_tag('gcat.db.t10', 'v-compact', " +
      s"${CommitLog.latest(spark, s"$wh/db/t10").get.version})")
    assert(spark.sql("SELECT count(*) c FROM graft_lake_tag(" +
      "'gcat.db.t10', 'v-compact')").as[Long].head() == 10L)
  }

  test("catalog-name scan keeps the optimizer surface: filter pushdown " +
    "and column pruning reach the parquet scan through the swap") {
    wh
    spark.sql("CREATE TABLE gcat.db.t11 (k BIGINT, v BIGINT, s STRING, " +
      "pd STRING) PARTITIONED BY (pd)")
    spark.sql("INSERT INTO gcat.db.t11 SELECT id, id, concat('x', id), " +
      "concat('p', id % 2) FROM range(0, 1000)")
    val plan = spark.sql(
      "SELECT k FROM gcat.db.t11 WHERE v > 500 AND pd = 'p1'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(v,500)"),
      s"filter did not push through the catalog swap:\n$plan")
    assert(!plan.contains("ReadSchema") ||
      !plan.split("ReadSchema").last.contains("s:"),
      s"unused column 's' survived pruning:\n$plan")
    assert(plan.contains("PartitionFilters") || !plan.contains("pd=p0"),
      "partition pruning lost through the swap")
  }

  test("dataframe writeTo append lands a commit (byName v2 write path)") {
    wh
    spark.sql("CREATE TABLE gcat.db.t9 (k BIGINT, v BIGINT, pd STRING)")
    spark.range(0, 5)
      .select($"id".as("k"), ($"id" * 3).as("v"), lit("p").as("pd"))
      .writeTo("gcat.db.t9").append()
    assert(rows("gcat.db.t9") == (0L until 5L).map(i => (i, i * 3, "p")).toSet)
    // a misspelled/extra column must fail loudly, not silently drop
    val e = intercept[Exception] {
      spark.range(5, 6)
        .select($"id".as("k"), ($"id" * 3).as("v"), lit("p").as("pd"),
          lit("oops").as("vv"))
        .writeTo("gcat.db.t9").append()
    }
    assert(e.getMessage.contains("vv"),
      s"extra column must be named in the error: ${e.getMessage}")
    assert(rows("gcat.db.t9").size == 5, "failed write must land nothing")
  }

  test("CTAS is atomic: a query that fails mid-write leaves NO table " +
    "and no staging garbage") {
    wh
    val boom = org.apache.spark.sql.functions.udf((k: Long) => {
      if (k == 7L) throw new RuntimeException("ctas poison")
      k
    })
    spark.udf.register("gcat_ctas_boom", boom)
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db.t18 AS " +
        "SELECT gcat_ctas_boom(id) AS k, 'p' AS pd FROM range(0, 100)")
    }
    assert(!spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getString(1)).contains("t18"),
      "failed CTAS must not publish a table")
    intercept[Exception] { spark.sql("SELECT * FROM gcat.db.t18").collect() }
    assert(!new java.io.File(s"$wh/db/t18").exists(),
      "failed CTAS must leave no table directory")
    assert(!new java.io.File(s"$wh/db").listFiles()
      .exists(_.getName.startsWith("_staging_ctas_")),
      "failed CTAS must clean its staging directory")
    // the name is free: the same CTAS (unpoisoned) succeeds afterwards
    spark.sql("CREATE TABLE gcat.db.t18 AS " +
      "SELECT id AS k, id AS v, 'p' AS pd FROM range(0, 5)")
    assert(rows("gcat.db.t18") == (0L until 5L).map(i => (i, i, "p")).toSet)
  }

  test("dynamic partition overwrite on a TWO-level partitioned table " +
    "replaces only the touched (pd1, pd2) tuples") {
    wh
    spark.sql("CREATE TABLE gcat.db.t17 (k BIGINT, v BIGINT, pd1 STRING, " +
      "pd2 STRING) PARTITIONED BY (pd1, pd2)")
    // 2 × 2 grid: (a|b, x|y), 5 rows each
    spark.sql("INSERT INTO gcat.db.t17 SELECT id, id, " +
      "IF(id % 2 = 0, 'a', 'b'), IF(id % 4 < 2, 'x', 'y') FROM range(0, 20)")
    val untouched = CommitLog.latest(spark, s"$wh/db/t17").get.files
      .filterNot(_.startsWith("pd1=a/pd2=x")).toSet
    assert(untouched.nonEmpty)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql("INSERT OVERWRITE gcat.db.t17 " +
      "SELECT id + 100, id, 'a', 'x' FROM range(0, 3)")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode",
      "static")
    val got = spark.sql("SELECT k, v, pd1, pd2 FROM gcat.db.t17")
      .as[(Long, Long, String, String)].collect().toSet
    val kept = (0L until 20L).filterNot(i => i % 2 == 0 && i % 4 < 2)
      .map(i => (i, i, if (i % 2 == 0) "a" else "b",
        if (i % 4 < 2) "x" else "y")).toSet
    assert(got == kept ++ (0L until 3L).map(i => (i + 100, i, "a", "x")),
      "only the (a, x) tuple may be replaced")
    assert(CommitLog.latest(spark, s"$wh/db/t17").get.files
      .filterNot(_.startsWith("pd1=a/pd2=x")).toSet == untouched,
      "untouched nested partitions must keep byte-identical files")
  }

  test("CREATE OR REPLACE TABLE ... AS SELECT: exact new schema in ONE " +
    "atomic commit, history stays time-travelable") {
    wh
    spark.sql("CREATE TABLE gcat.db.rt (k BIGINT, v BIGINT, pd STRING) " +
      "PARTITIONED BY (pd) TBLPROPERTIES ('graft.statscols' = 'k')")
    spark.sql("INSERT INTO gcat.db.rt " +
      "SELECT id, id * 10, concat('p', id % 2) FROM range(0, 10)")
    val dir = s"$wh/db/rt"
    val vOld = CommitLog.latest(spark, dir).get.version
    // REPLACE with a NARROWER, retyped, re-partitioned shape: the old
    // columns must NOT linger (an additive merge would keep v)
    spark.sql("CREATE OR REPLACE TABLE gcat.db.rt " +
      "PARTITIONED BY (grp) AS " +
      "SELECT id AS k, CAST(id AS INT) AS n, concat('g', id % 3) AS grp " +
      "FROM range(0, 6)")
    val df = spark.sql("SELECT * FROM gcat.db.rt")
    assert(df.columns.toSeq == Seq("k", "n", "grp"),
      s"the replaced schema must be EXACT, got ${df.columns.toSeq}")
    assert(df.count() == 6)
    assert(spark.sql("SELECT sum(n) FROM gcat.db.rt").as[Long].head() == 15L)
    val snap = CommitLog.latest(spark, dir).get
    assert(snap.files.forall(_.startsWith("grp=")),
      "the replacement owns the hive layout")
    assert(snap.statsCols == Seq("k"),
      "per-column declarations survive only for surviving columns")
    assert(snap.physNames.isEmpty && snap.retired.isEmpty,
      "rename/drop bookkeeping resets with the schema")
    // the pre-replace world is still one VERSION AS OF away
    val old = spark.sql(
      s"SELECT * FROM gcat.db.rt VERSION AS OF $vOld")
    assert(old.columns.toSeq == Seq("k", "v", "pd") && old.count() == 10,
      "history must stay time-travelable through the replace")
    // REPLACE TABLE (no OR CREATE) on a missing table fails like SQL
    intercept[Exception] {
      spark.sql("REPLACE TABLE gcat.db.rt_missing AS SELECT 1 AS a")
    }
    // CREATE OR REPLACE on a missing table creates
    spark.sql("CREATE OR REPLACE TABLE gcat.db.rt_new AS " +
      "SELECT id AS a FROM range(0, 3)")
    assert(spark.sql("SELECT count(*) FROM gcat.db.rt_new")
      .as[Long].head() == 3L)
    // post-replace writes keep working under the new schema
    spark.sql("INSERT INTO gcat.db.rt VALUES (100, 1, 'g0')")
    assert(spark.sql("SELECT count(*) FROM gcat.db.rt")
      .as[Long].head() == 7L)
  }
}

package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plans.{ConstraintCatalog, MatViewCatalog}

/** [[LakeTvf]]: `spark.sql` over `graft_lake(...)` must behave exactly
  * like the DataFrame read — snapshot isolation, time travel, change
  * feed, and the materialized-view rewrite all reachable from SQL text.
  */
class LakeTvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(): String = {
    val work = java.nio.file.Files.createTempDirectory("graft_tvf_")
    work.toFile.deleteOnExit()
    val dir = s"$work/t"
    spark.range(0, 40).select($"id".as("k"), ($"id" % 4).as("g"),
      lit(1L).as("v"), lit("a").as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
    dir
  }

  test("graft_lake serves the latest snapshot; _at time-travels; " +
      "_changes feeds; _history reports") {
    val dir = fixture()
    CommitLog.upsert(spark,
      spark.range(0, 10).select($"id".as("k"), ($"id" % 4).as("g"),
        lit(9L).as("v"), lit("a").as("pd")),
      dir, Seq("k"), "pd")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_lake('$dir')")
      .head().getLong(0) == 40L)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_lake('$dir') WHERE v = 9")
      .head().getLong(0) == 10L)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_lake_at('$dir', 1) WHERE v = 9")
      .head().getLong(0) == 0L)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_lake_changes('$dir', 1, 2)")
      .head().getLong(0) == 40L) // post-image of the touched partition
    val hist = spark.sql(s"SELECT op FROM graft_lake_history('$dir')")
      .as[String].collect().toSeq
    assert(hist == Seq("init", "upsert"))
    // filters push into the TVF's scan like any parquet read
    val plan = spark.sql(
        s"SELECT k FROM graft_lake('$dir') WHERE k = 7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(k,7"),
      s"filter not pushed:\n$plan")
  }

  test("a SQL aggregate over graft_lake routes to the materialized view") {
    val dir = fixture()
    val work = dir.stripSuffix("/t")
    val d = IncrementalView.Definition(
      dir, s"$work/view", "pd", Seq("g"),
      Seq(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v")),
      invertible = true)
    MatViewCatalog.register(d)
    IncrementalView.refresh(spark, d)
    val got = spark.sql(
      s"SELECT g, count(*) AS n, sum(v) AS sv FROM graft_lake('$dir') " +
        "GROUP BY g ORDER BY g")
    val dirs = got.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(p =>
          ConstraintCatalog.normalize(p.toString))
        case _ => Nil
      }
    }.flatten
    assert(dirs.nonEmpty && dirs.forall(
      _.startsWith(ConstraintCatalog.normalize(s"$work/view"))),
      s"SQL aggregate did not route to the view: $dirs")
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((0L, 10L, 10L), (1L, 10L, 10L), (2L, 10L, 10L),
        (3L, 10L, 10L)))
  }

  test("graft_lake_files reports per-file bytes/rows from the " +
      "metadata plane") {
    val work = java.nio.file.Files.createTempDirectory("graft_tvf_f_")
    work.toFile.deleteOnExit()
    val dir = s"$work/t"
    spark.range(0, 40).select($"id".as("k"), lit("a").as("pd"))
      .repartition(2).write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir, statsCols = Seq("k"))
    val rep = spark.sql(
      s"SELECT file, partition, bytes, rows FROM graft_lake_files('$dir')")
      .collect()
    assert(rep.length == CommitLog.latest(spark, dir).get.files.size)
    assert(rep.forall(_.getLong(2) > 0L), "bytes must be real sizes")
    assert(rep.map(_.getLong(3)).sum == 40L, "manifest rows must sum to n")
    assert(rep.forall(_.getString(1) == "pd=a"))
  }

  test("refs are reachable from SQL: _tag, _tags, _published follow the pointers") {
    val dir = fixture()
    CommitLog.upsert(spark,
      spark.range(100, 110).select($"id".as("k"), ($"id" % 4).as("g"),
        lit(2L).as("v"), lit("a").as("pd")),
      dir, Seq("k"), "pd")
    LakeRefs.tag(spark, dir, "anchor", 1L)
    LakeRefs.publish(spark, dir, 1L)
    // tag + published both resolve version 1 (40 rows); latest has 50
    assert(spark.sql(s"SELECT count(*) FROM graft_lake_tag('$dir', 'anchor')")
      .head().getLong(0) == 40L)
    assert(spark.sql(s"SELECT count(*) FROM graft_lake_published('$dir')")
      .head().getLong(0) == 40L)
    assert(spark.sql(s"SELECT count(*) FROM graft_lake('$dir')")
      .head().getLong(0) == 50L)
    val tags = spark.sql(s"SELECT tag, version FROM graft_lake_tags('$dir')")
      .as[(String, Long)].collect().toSeq
    assert(tags == Seq(("anchor", 1L)))
    // the publish audit trail: one advance so far, to version 1
    val hist = spark.sql(
      s"SELECT seq, version FROM graft_lake_publish_history('$dir')")
      .as[(Long, Long)].collect().toSeq
    assert(hist == Seq((1L, 1L)))
  }

  test("metadata-plane rollups are reachable from SQL: _stats_by_partition and _distinct") {
    val work = java.nio.file.Files.createTempDirectory("graft_tvf2_")
    work.toFile.deleteOnExit()
    val dir = s"$work/t"
    spark.range(0, 60).select($"id".as("k"), ($"id" % 7).as("u"),
        concat(lit("g"), ($"id" % 2).cast("long")).as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir, statsCols = Seq("k"),
      thetaCols = Seq("u"), thetaLgK = 12)
    val stats = spark.sql(
      s"SELECT pd, rows, min_k, max_k FROM graft_lake_stats_by_partition('$dir', 'k')")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(stats == Set(("g0", 30L, 0L, 58L), ("g1", 30L, 1L, 59L)))
    val dst = spark.sql(
      s"SELECT pd, distinct_u FROM graft_lake_distinct('$dir', 'u')")
      .as[(String, Long)].collect().toSet
    assert(dst == Set(("g0", 7L), ("g1", 7L)))
    // the explicit global rollup, and the partitioned-table fallback
    val g = spark.sql(
      s"SELECT distinct_u FROM graft_lake_distinct_global('$dir', 'u')")
      .as[Long].head()
    assert(g == 7L)
    // an UNPARTITIONED lake: graft_lake_distinct falls back to the
    // global rollup instead of erroring out of the metadata plane
    val flat = s"$work/flat"
    spark.range(0, 40).select($"id".as("k"), ($"id" % 5).as("u"))
      .coalesce(2).write.parquet(flat)
    CommitLog.init(spark, flat, thetaCols = Seq("u"), thetaLgK = 12)
    val fg = spark.sql(
      s"SELECT distinct_u FROM graft_lake_distinct('$flat', 'u')")
      .as[Long].head()
    assert(fg == 5L)
  }

  test("non-literal arguments fail loudly") {
    val dir = fixture()
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_lake_at('$dir', 1 + 1)").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }
}

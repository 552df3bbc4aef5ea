package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.NativeSketches._

/** Theta sketches ([[graft.functions.NativeSketches.ThetaAgg]] + set-op
  * scalars): the distinct-set ALGEBRA HLL lacks. Pinned properties —
  *
  *  - EXACT mode: below 2^lgK distinct values every estimate and every
  *    set operation is an exact integer (q147's oracle gate rides this);
  *  - estimate mode: union/intersection/difference estimates stay within
  *    the family's relative error at cardinalities far above the
  *    sketch's nominal entries;
  *  - rollup: per-group sketches union (thetaUnionAgg) to the same
  *    answer as a direct global build, and sketch bytes survive parquet;
  *  - the aggregate combines map-side (sketch bytes shuffle).
  */
class ThetaSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def est(c: org.apache.spark.sql.Column) = round(thetaEstimate(c))

  test("exact mode: set algebra returns exact integers") {
    // A = {0..99}, B = {50..149}: tiny — far below nominal entries
    val sk = spark.range(150)
      .select($"id",
        when($"id" < 100, lit("A")).as("inA"),
        when($"id" >= 50, lit("B")).as("inB"))
      .select(explode(array_compact(array($"inA", $"inB"))).as("s"), $"id")
      .groupBy($"s").agg(thetaAgg($"id", 12).as("sk"))
    val a = sk.filter($"s" === "A").select($"sk".as("sa"))
    val b = sk.filter($"s" === "B").select($"sk".as("sb"))
    val row = a.crossJoin(b).select(
      est(thetaUnion($"sa", $"sb")).cast("long"),
      est(thetaIntersect($"sa", $"sb")).cast("long"),
      est(thetaDiff($"sa", $"sb")).cast("long"),
      est($"sa").cast("long")).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((150L, 50L, 50L, 100L)))
  }

  test("estimate mode: errors bounded at 50x nominal entries") {
    // A = {0..199999}, B = {100000..299999} with lgK=12 (4096 entries)
    val a = spark.range(0, 200000).agg(thetaAgg($"id", 12).as("s"))
      .select($"s".as("sa"))
    val b = spark.range(100000, 300000).agg(thetaAgg($"id", 12).as("s"))
      .select($"s".as("sb"))
    val row = a.crossJoin(b).select(
      thetaEstimate(thetaUnion($"sa", $"sb")),
      thetaEstimate(thetaIntersect($"sa", $"sb")),
      thetaEstimate(thetaDiff($"sa", $"sb"))).head()
    // theta rse ~1/sqrt(k) = 1.6%; intersections compound — allow 6%
    assert(math.abs(row.getDouble(0) - 300000) / 300000.0 <= 0.05,
      s"union est ${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 100000) / 100000.0 <= 0.06,
      s"intersect est ${row.getDouble(1)}")
    assert(math.abs(row.getDouble(2) - 100000) / 100000.0 <= 0.06,
      s"diff est ${row.getDouble(2)}")
  }

  test("rollup: per-group sketches union to the direct global answer; parquet round-trips") {
    val dir = Files.createTempDirectory("graft_theta_").toString
    // 20k values in 7 arbitrary groups — grouping must not matter
    spark.range(20000)
      .select(($"id" % 7).as("g"), $"id")
      .groupBy($"g").agg(thetaAgg($"id", 12).as("sketch"))
      .write.parquet(s"$dir/sk")
    val merged = spark.read.parquet(s"$dir/sk")
      .agg(thetaUnionAgg($"sketch", 12).as("m"))
      .select(thetaEstimate($"m")).head().getDouble(0)
    val direct = spark.range(20000).agg(thetaAgg($"id", 12).as("s"))
      .select(thetaEstimate($"s")).head().getDouble(0)
    assert(math.abs(merged - direct) / direct <= 0.02,
      s"rollup $merged vs direct $direct")
    assert(math.abs(merged - 20000) / 20000.0 <= 0.04, s"estimate $merged")
  }

  test("theta aggregate combines map-side (sketch bytes shuffle)") {
    val plan = spark.range(1000)
      .select(($"id" % 3).as("g"), $"id")
      .groupBy($"g").agg(thetaAgg($"id", 12).as("s"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("partial_graft_theta_agg"),
      s"no partial aggregation stage:\n$plan")
  }

  test("the sketch family is callable from SQL text") {
    spark.range(150)
      .select($"id", when($"id" < 100, "A").otherwise("B").as("g"))
      .createOrReplaceTempView("theta_sql_in")
    // theta: build per-group, then set algebra across the two groups
    val row = spark.sql(
      """WITH sk AS (
        |  SELECT g, graft_theta_agg(CAST(id AS STRING), 12) AS s
        |  FROM theta_sql_in GROUP BY g)
        |SELECT
        |  CAST(round(graft_theta_estimate(graft_theta_union(a.s, b.s))) AS LONG),
        |  CAST(round(graft_theta_estimate(graft_theta_intersect(a.s, b.s))) AS LONG)
        |FROM sk a JOIN sk b ON a.g = 'A' AND b.g = 'B'""".stripMargin).head()
    assert((row.getLong(0), row.getLong(1)) == ((150L, 0L)))
    // kll: aggregate + quantile extraction round-trips through SQL
    val q = spark.sql(
      """SELECT graft_kll_quantiles(graft_kll_merge(s, 200), 0.5)[0]
        |FROM (SELECT g, graft_kll_agg(CAST(id AS DOUBLE), 200) AS s
        |      FROM theta_sql_in GROUP BY g)""".stripMargin)
      .head().getDouble(0)
    assert(q >= 60.0 && q <= 90.0, s"SQL median of 0..149 came back $q")
    // misra-gries: candidates surface through SQL too
    val cands = spark.sql(
      """SELECT graft_freq_candidates(g, 64, 0.5) FROM theta_sql_in""")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(cands.map(_.getString(0)) == Seq("A"))
  }

  test("null sketches propagate through the set ops") {
    val row = spark.range(1)
      .select(
        thetaUnion(lit(null).cast("binary"), lit(null).cast("binary")),
        thetaEstimate(lit(null).cast("binary"))).head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }
}

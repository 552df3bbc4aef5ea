package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

import graft.model.Model
import graft.ops.RadarOps
import graft.parse.{ReportFixtures, ReportParser}

class SpeedHistogramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def histRow(bins: Seq[Int]) = {
    val cols = Model.speedBins.zip(bins).map { case (n, v) => lit(v).as(n) } :+
      lit(bins.sum).as("total")
    spark.range(1).select(cols: _*)
  }

  test("weighted mean: all mass in one bin → that bin's midpoint") {
    val df = histRow(Seq(0, 0, 10, 0, 0, 0, 0, 0, 0, 0, 0))
    val got = df.select(SpeedHistogram.weightedMeanCol.as("m")).as[Double].head()
    assert(math.abs(got - 25.5) < 1e-9)
  }

  test("p85 linear interpolation inside the crossing bin") {
    // 10 vehicles all in 21-30: target 8.5 → 21 + 8.5/10 * 9 = 28.65
    val df = histRow(Seq(0, 0, 10, 0, 0, 0, 0, 0, 0, 0, 0))
    val got = df.select(SpeedHistogram.percentileCol(0.85).as("p")).as[Double].head()
    assert(math.abs(got - 28.65) < 1e-9)
  }

  test("p50 across two bins picks the second when cum crosses there") {
    // 4 in bin0 (0-10), 6 in bin1 (11-20); target 5 → bin1: 11 + (5-4)/6 * 9
    val df = histRow(Seq(4, 6, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    val got = df.select(SpeedHistogram.percentileCol(0.5).as("p")).as[Double].head()
    assert(math.abs(got - (11.0 + 1.0 / 6.0 * 9.0)) < 1e-9)
  }

  test("zero total → null mean and percentile") {
    val df = histRow(Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    val got = df.select(
      SpeedHistogram.weightedMeanCol.as("m"), SpeedHistogram.percentileCol(0.85).as("p"))
      .as[(Option[Double], Option[Double])].head()
    assert(got == ((None, None)))
  }

  test("dailyProfile preserves the bins==total invariant through re-aggregation") {
    val report = ReportParser.parseGrid("t2", ReportFixtures.template2()).toOption.get
    val flows = RadarOps.normalizeFlows(spark.createDataFrame(report.rows))
    val profile = SpeedHistogram.dailyProfile(flows)
    assert(profile.count() == 2) // one per direction
    assert(profile.filter(SpeedHistogram.invariantViolated).count() == 0)
    val totals = profile.agg(sum($"total")).as[Long].head()
    assert(totals == flows.agg(sum($"total")).as[Long].head())
    assert(profile.filter($"mean_speed".isNull || $"p85_speed".isNull).count() == 0)
  }

  test("topKBusiest ranks slots per equipment") {
    val report = ReportParser.parseGrid("t1", ReportFixtures.template1()).toOption.get
    val flows = RadarOps.normalizeFlows(spark.createDataFrame(report.rows))
    val top = SpeedHistogram.topKBusiest(flows, 3)
    assert(top.count() == 3)
    val ranks = top.select("rank").as[Int].collect().toSet
    assert(ranks == Set(1, 2, 3))
  }
}

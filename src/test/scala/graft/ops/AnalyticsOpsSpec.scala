package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-08 $h%02d:$m%02d:00")   // a Monday
  private def day(d: Int, h: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("funnel: strict ordering — same-instant and out-of-order events don't convert") {
    val e = Seq(
      // u1 converts fully: view@1 < click@2 < purchase@3
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // u2: click BEFORE first view — not stage 2
      (2L, "click", ts(1)), (2L, "view", ts(2)),
      // u3: click at the SAME instant as view — strict > rejects it
      (3L, "view", ts(4)), (3L, "click", ts(4)),
      // u4: view then click, purchase before click — stops at stage 2
      (4L, "view", ts(1)), (4L, "purchase", ts(2)), (4L, "click", ts(5)))
      .toDF("user_id", "event_type", "ts")
    val got = AnalyticsOps
      .funnel(e, "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .select($"stage", $"step", $"users", $"pct_of_top")
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1, "view", 4L, 1.0),
      (2, "click", 2L, 0.5),      // u1 and u4
      (3, "purchase", 1L, 0.25))) // u1 only
  }

  test("funnel: later re-occurrence converts even when the first attempt predates") {
    // u5's first click precedes its first view, but a second click after
    // the view exists — the per-stage min is over QUALIFYING events only
    val e = Seq(
      (5L, "click", ts(1)), (5L, "view", ts(2)), (5L, "click", ts(3)))
      .toDF("user_id", "event_type", "ts")
    val got = AnalyticsOps
      .funnel(e, "user_id", "event_type", "ts", Seq("view", "click"))
      .select($"stage", $"users").as[(Int, Long)].collect().toSeq
    assert(got == Seq((1, 1L), (2, 1L)))
  }

  test("cohortRetention: offsets count from each user's first week") {
    val e = Seq(
      (1L, day(1)), (1L, day(10)), (1L, day(16)),  // weeks 0, 1, 2
      (2L, day(10)), (2L, day(16)),                // cohort W2: offsets 0, 1
      (3L, day(16)))                               // cohort W3: offset 0
      .toDF("user_id", "ts")
    val got = AnalyticsOps.cohortRetention(e, "user_id", "ts")
      .as[(String, Int, Long)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 1L), ("2024-01-01", 1, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L),
      ("2024-01-15", 0, 1L)))
  }

  test("linearTrend recovers an exact line and is partitioning-independent") {
    // y = 3x + 10 exactly; with repartition(7) the decimal sums must not move
    val df = (0 until 100).map(x => ("g", x, 3.0 * x + 10.0))
      .toDF("g", "x", "y").repartition(7)
    val got = AnalyticsOps.linearTrend(df, "g", $"x", $"y")
      .select($"n", $"slope", $"intercept")
      .as[(Long, Double, Double)].head()
    assert(got == ((100L, 3.0, 10.0)))
    // x past 46341 (Int x*x overflow point) must not throw under ANSI
    val big = Seq(("g", 50000, 1.0), ("g", 50001, 2.0), ("g", 50002, 3.0))
      .toDF("g", "x", "y")
    val slope = AnalyticsOps.linearTrend(big, "g", $"x", $"y")
      .select($"slope").as[Double].head()
    assert(slope == 1.0)
  }

  test("peakConcurrency: back-to-back intervals don't overlap; peak_ts is earliest") {
    val iv = Seq(
      // [0,2) [1,3) [2,4): peak 2, first reached at h=1
      ("a", 1L, ts(0), ts(2)), ("a", 2L, ts(1), ts(3)), ("a", 3L, ts(2), ts(4)),
      // back-to-back [5,6) [6,7): never concurrent
      ("b", 4L, ts(5), ts(6)), ("b", 5L, ts(6), ts(7)))
      .toDF("g", "id", "t0", "t1")
    val got = AnalyticsOps.peakConcurrency(iv, "g", "t0", "t1", "id")
      .as[(String, Int, Timestamp)].collect().toSeq
    assert(got == Seq(("a", 2, ts(1)), ("b", 1, ts(5))))
  }

  test("zscoreOutliers flags only true deviants and skips small keys") {
    val rows =
      (1 to 20).map(i => (1L, i.toLong, 10.0)) :+ ((1L, 99L, 1000.0)) :+
        // key 2 has n=2 < minN — its wild value must NOT be flagged
        ((2L, 200L, 0.0)) :+ ((2L, 201L, 1e6))
    val got = AnalyticsOps.zscoreOutliers(
        rows.toDF("k", "id", "v"), "k", "v", "id")
      .select($"id").as[Long].collect().toSeq
    assert(got == Seq(99L))
  }

  test("chiSquare: exact zero on perfectly independent margins, dof right") {
    // cell counts 10/20/30/60 factorize as (30,90)x(40,80)/120 → chi2 = 0
    val rows =
      Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
        Seq.fill(30)(("b", "x")) ++ Seq.fill(60)(("b", "y"))
    val got = AnalyticsOps.chiSquare(rows.toDF("u", "v"), "u", "v")
      .as[(Double, Int, Long)].head()
    assert(got == ((0.0, 1, 120L)))
    // fully dependent 2x2 (diagonal only): chi2 = n
    val dep = (Seq.fill(25)(("a", "x")) ++ Seq.fill(25)(("b", "y")))
    val got2 = AnalyticsOps.chiSquare(dep.toDF("u", "v"), "u", "v")
      .as[(Double, Int, Long)].head()
    assert(got2 == ((50.0, 1, 50L)))
  }

  test("weightedMedian: weights shift the median off the unweighted one") {
    val df = Seq(
      // unweighted median of (1,2,3) is 2; weight 10 on the 3 pulls it up
      ("a", 1.0, 1L, 1L), ("a", 2.0, 1L, 2L), ("a", 3.0, 10L, 3L),
      // symmetric weights: first value where 2*cum >= tot → the 5
      ("b", 5.0, 1L, 4L), ("b", 7.0, 1L, 5L))
      .toDF("g", "v", "w", "id")
    val got = AnalyticsOps.weightedMedian(df, "g", "v", "w", Seq("id"))
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 3.0), ("b", 5.0)))
  }

  test("zscoreOutliers: constant key flags nothing (variance guard)") {
    // 12 identical values whose 6-dp decimal rounding differs from the
    // raw double: the decimal-vs-raw mismatch makes varPop cancel to
    // ~0 (possibly slightly negative) while dev² > 0 — without the
    // variance>0 guard every row would be flagged (or ANSI-divide-crash)
    val df = (1L to 12L).map(i => (i, "u", 0.1234564)).toDF("id", "k", "v")
    assert(AnalyticsOps.zscoreOutliers(df, "k", "v", "id").count() == 0)
  }

  test("chiSquare: NULL categories are excluded, not zero-marginal cells") {
    val rows: Seq[(String, Option[String])] =
      Seq.fill(10)(("a", Some("x"))) ++ Seq.fill(10)(("b", Some("y"))) ++
        Seq.fill(5)(("a", None)) // null category: must not poison n/dof
    val got = AnalyticsOps.chiSquare(rows.toDF("u", "v"), "u", "v")
      .as[(Double, Int, Long)].head()
    assert(got == ((20.0, 1, 20L))) // diagonal 2x2 on the non-null rows
  }

  test("peakConcurrency: null-boundary intervals don't undercount") {
    val t = (h: Int) => java.sql.Timestamp.valueOf(f"2024-01-08 $h%02d:00:00")
    val df = Seq(
      ("g", Some(t(1)), Some(t(4)), 1L),
      ("g", Some(t(2)), Some(t(3)), 2L),
      ("g", Some(t(2)), None, 3L)) // open-ended row: excluded, not -1
      .toDF("g", "s", "e", "id")
    val got = AnalyticsOps.peakConcurrency(df, "g", "s", "e", "id")
      .select("peak").as[Int].head()
    assert(got == 2)
  }

  test("weightedMedian: fractional weights floor portably") {
    // floor(2.7)=2, floor(2.0)=2 → balanced; first value wins at 2cum>=tot
    val df = Seq(("g", 1.0, 2.7, 1L), ("g", 9.0, 2.0, 2L))
      .toDF("g", "v", "w", "id")
    val got = AnalyticsOps.weightedMedian(df, "g", "v", "w", Seq("id"))
      .as[(String, Double)].head()
    assert(got == (("g", 1.0)))
  }

  test("abLift: exact counts and closed-form z on a tiny experiment") {
    import org.apache.spark.sql.functions.col
    // variant 0: users 0,2 (user 0 converts) — variant 1: users 1,3 (both)
    val ev = Seq(
      (0L, "view"), (0L, "purchase"), (0L, "purchase"), // dup conversion: 1
      (2L, "view"),
      (1L, "purchase"), (3L, "purchase"), (3L, "view"))
      .toDF("user_id", "event_type")
      .withColumn("v", col("user_id") % 2)
    val got = AnalyticsOps.abLift(ev, "v", "user_id",
        col("event_type") === "purchase")
      .as[(Long, Long, Long, Long, Long, Long, Double, Double, Double,
        Option[Double])].head()
    // pool = 3/4; den = sqrt(.75*.25*(0.5+0.5)) = sqrt(3)/4 ≈ .433013
    // z = (1 - 0.5)/den ≈ 1.154701
    assert(got._1 == 0L && got._2 == 1L)
    assert((got._3, got._4, got._5, got._6) == ((2L, 1L, 2L, 2L)))
    assert((got._7, got._8, got._9) == ((0.5, 1.0, 0.5)))
    assert(math.abs(got._10.get - 1.154701) < 1e-9)
  }

  test("abLift: a NULL variant fails loudly, not a half-NULL row") {
    import org.apache.spark.sql.functions.{col, when}
    val ev = Seq((0L, "purchase"), (1L, "view"))
      .toDF("user_id", "event_type")
      .withColumn("v", when(col("user_id") === 0L, "control")) // else NULL
    val e = intercept[Exception] {
      AnalyticsOps.abLift(ev, "v", "user_id",
        col("event_type") === "purchase").collect()
    }
    assert(e.getMessage.contains("two non-null variants"), e.getMessage)
  }

  test("abLift: zero-variance pool yields NULL z, not a crash") {
    import org.apache.spark.sql.functions.col
    val ev = Seq((0L, "purchase"), (1L, "purchase"))
      .toDF("user_id", "event_type")
      .withColumn("v", col("user_id") % 2)
    val z = AnalyticsOps.abLift(ev, "v", "user_id",
        col("event_type") === "purchase")
      .select(col("z")).as[Option[Double]].head()
    assert(z.isEmpty)
  }

  test("cumulativeDistinct: entities count once, at their first bucket") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("u1", 1), ("u1", 3), // u1 arrives at bucket 1; bucket-3 row ignored
      ("u2", 1),
      ("u3", 2), ("u3", 3))
      .toDF("u", "d")
    val got = AnalyticsOps.cumulativeDistinct(df, "u", col("d"))
      .as[(Int, Long, Long)].collect().toSeq
    // bucket 3 has no NEW arrivals → absent (documented: arrival series)
    assert(got == Seq((1, 2L, 2L), (2, 1L, 3L)))
  }

  test("madOutliers: MAD ignores the spike the mean would chase") {
    // 1..9 plus a 1000 spike: med = 5.5, adevs sort to median 2.5, so
    // threshold 3·2.5 = 7.5 flags ONLY the spike (z-score with the same
    // data would inflate sigma past flagging anything)
    val df = ((1 to 9).map(v => ("u", v.toDouble)) :+ (("u", 1000.0)))
      .toDF("k", "v")
    val got = AnalyticsOps.madOutliers(df, "k", "v", k = 3)
      .as[(String, Long, Double, Double, Long)].head()
    assert(got == (("u", 10L, 5.5, 2.5, 1L)))
  }

  test("winsorize: clamp counts and clamped mean are exact on 1..100") {
    // p05 = 5.95, p95 = 95.05 (index p·(n−1) interpolation); 5 values
    // clamp on each tail; mean = (5·5.95 + Σ6..95 + 5·95.05)/100 = 50.5
    val df = (1 to 100).map(v => ("g", v.toDouble)).toDF("k", "v")
    val got = AnalyticsOps.winsorize(df, "k", "v")
      .as[(String, Long, Long, Long, Double, Double, Double)].head()
    assert(got == (("g", 100L, 5L, 5L, 5.95, 95.05, 50.5)))
  }
}

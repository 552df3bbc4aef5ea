package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JoinOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoinBackward attaches latest at-or-before right row per key") {
    val trades = Seq(
      ("A", ts("2021-01-01 10:00:03"), 100.0),
      ("A", ts("2021-01-01 10:00:07"), 101.0),
      ("B", ts("2021-01-01 10:00:01"), 50.0))
      .toDF("sym", "ts", "price")
    val quotes = Seq(
      ("A", ts("2021-01-01 10:00:00"), 99.5),
      ("A", ts("2021-01-01 10:00:03"), 99.9), // tie with trade 1 → inclusive
      ("A", ts("2021-01-01 10:00:05"), 100.4),
      ("B", ts("2021-01-01 10:00:02"), 49.9)) // after B's only trade
      .toDF("sym", "ts", "quote")

    val joined = JoinOps.asofJoinBackward(trades, quotes, Seq("sym"), "ts", Seq("quote"))
      .orderBy("sym", "ts")
      .select($"sym", $"price", $"asof_quote")
      .as[(String, Double, Option[Double])].collect().toSeq

    assert(joined == Seq(
      ("A", 100.0, Some(99.9)),   // inclusive tie at 10:00:03
      ("A", 101.0, Some(100.4)),  // latest prior quote
      ("B", 50.0, None)))         // no quote at-or-before
  }

  test("asofJoinBackward equals the naive inequality join on events data") {
    import graft.tables.Tables
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"ts".as("signup_ts"))
    val fast = JoinOps.asofJoinBackward(
      purchases, signups, Seq("user_id"), "ts", Seq("signup_ts"))
      .select($"event_id", $"asof_signup_ts".cast("long").as("sig"))
    val naive = purchases.as("p")
      .join(signups.as("s"),
        $"p.user_id" === $"s.user_id" && $"s.ts" <= $"p.ts", "left")
      .groupBy($"p.event_id".as("event_id"))
      .agg(max($"s.signup_ts").cast("long").as("sig"))
    assert(fast.except(naive).count() == 0 && naive.except(fast).count() == 0)
  }

  test("intervalJoin matches rows into broadcast interval bands") {
    val facts = Seq(1.0, 5.0, 10.0, 99.0).toDF("v")
    val bands = Seq(("low", 0.0, 5.0), ("mid", 5.0, 50.0)).toDF("band", "lo", "hi")
    val got = JoinOps.intervalJoin(facts, bands, col("v"), col("lo"), col("hi"))
      .select("v", "band").as[(Double, String)].collect().toSet
    assert(got == Set((1.0, "low"), (5.0, "mid"), (10.0, "mid")))
  }

  test("bloomPreFilteredJoin equals the plain join (false positives removed)") {
    val probe = spark.range(0, 2000).select($"id".as("k"), ($"id" * 3).as("pv"))
    val build = spark.range(0, 2000, 17).select($"id".as("bk"), lit("d").as("dv"))
    val got = JoinOps.bloomPreFilteredJoin(
      probe, build, col("k"), "bk", expectedKeys = 200L)
    val plain = probe.join(build, col("k") === col("bk"))
    assert(got.columns.toSeq == plain.columns.toSeq)
    assert(got.except(plain).count() == 0 && plain.except(got).count() == 0)
    // null probe keys must be dropped, not crash the filter UDF
    val withNull = probe.select(
      when($"k" === 5, lit(null).cast("long")).otherwise($"k").as("k"), $"pv")
    val gotN = JoinOps.bloomPreFilteredJoin(
      withNull, build, col("k"), "bk", expectedKeys = 200L)
    assert(gotN.count() == plain.count())   // k=5 isn't a build key anyway
  }

  test("bloomPreFilteredJoin handles string keys (no long-cast crash)") {
    val probe = Seq("a", "b", "c", "d").toDF("k")
    val build = Seq(("b", 1), ("d", 2)).toDF("bk", "v")
    val got = JoinOps.bloomPreFilteredJoin(
        probe, build, col("k"), "bk", expectedKeys = 2L)
      .select("k", "v").as[(String, Int)].collect().toSet
    assert(got == Set(("b", 1), ("d", 2)))
    val e = intercept[IllegalArgumentException] {
      JoinOps.bloomPreFilteredJoin(
        Seq(1.5).toDF("k"), Seq(1.5).toDF("bk"), col("k"), "bk", 2L)
    }
    assert(e.getMessage.contains("unsupported key type"))
  }

  test("bloomPreFilteredJoin: same key name on both sides resolves") {
    // the usual equi-join shape: both sides call the key "k" — the
    // build-side reference must be qualified or analysis is ambiguous
    val probe = Seq(1L, 2L, 3L).toDF("k")
    val build = Seq((2L, "x")).toDF("k", "tag")
    val got = JoinOps.bloomPreFilteredJoin(
        probe, build, probe("k"), "k", expectedKeys = 1L)
      .select("tag").as[String].collect().toSeq
    assert(got == Seq("x"))
  }
}

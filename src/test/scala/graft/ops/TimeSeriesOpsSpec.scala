package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TimeSeriesOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("gapFillInterpolate fills exactly the missing buckets, linearly") {
    // user 1: hours 0, 3 present (gap 1, 2); user 2: dense already
    val perHour = Seq(
      (1L, ts(0), 10.0), (1L, ts(3), 40.0),
      (2L, ts(5), 7.0), (2L, ts(6), 9.0))
      .toDF("k", "h", "v")
    val got = TimeSeriesOps.gapFillInterpolate(perHour, "k", "h", "v")
      .orderBy($"k", $"h")
      .select($"k", $"h", $"is_gap", $"val_filled")
      .as[(Long, Timestamp, Boolean, Double)].collect().toSeq
    assert(got == Seq(
      (1L, ts(0), false, 10.0),
      (1L, ts(1), true, 20.0),    // 10 + (40-10) * 1/3
      (1L, ts(2), true, 30.0),
      (1L, ts(3), false, 40.0),
      (2L, ts(5), false, 7.0),
      (2L, ts(6), false, 9.0)))
  }

  test("gapFillInterpolate: null-valued rows are treated as gaps and interpolated over") {
    val perHour = Seq(
      (1L, ts(0), Some(10.0)), (1L, ts(1), None), (1L, ts(2), Some(30.0)))
      .toDF("k", "h", "v")
    val got = TimeSeriesOps.gapFillInterpolate(perHour, "k", "h", "v")
      .orderBy($"h")
      .select($"h", $"is_gap", $"val_filled")
      .as[(Timestamp, Boolean, Double)].collect().toSeq
    assert(got == Seq(
      (ts(0), false, 10.0), (ts(1), true, 20.0), (ts(2), false, 30.0)))
  }

  test("gapFillInterpolate: single-bucket series emits one non-gap row") {
    val got = TimeSeriesOps.gapFillInterpolate(
        Seq((9L, ts(4), 1.5)).toDF("k", "h", "v"), "k", "h", "v")
      .select($"k", $"is_gap", $"val_filled")
      .as[(Long, Boolean, Double)].collect().toSeq
    assert(got == Seq((9L, false, 1.5)))
  }

  test("scd2 collapses runs and stitches half-open validity intervals") {
    val ev = Seq(
      (1L, "new", ts(0), 1L), (1L, "new", ts(1), 2L),
      (1L, "active", ts(2), 3L), (1L, "active", ts(3), 4L),
      (1L, "churned", ts(4), 5L),
      (2L, "new", ts(0), 6L))
      .toDF("u", "status", "t", "id")
    val got = TimeSeriesOps.scd2(ev, $"u", $"status", $"t", $"id")
      .orderBy($"key", $"version")
      .as[(Long, String, Timestamp, Option[Timestamp], Int)].collect().toSeq
    assert(got == Seq(
      (1L, "new", ts(0), Some(ts(2)), 1),
      (1L, "active", ts(2), Some(ts(4)), 2),
      (1L, "churned", ts(4), None, 3),
      (2L, "new", ts(0), None, 1)))
  }

  test("locf carries the last non-null forward within each key") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, ts(10, 0), 1L, None),
      (1L, ts(10, 30), 2L, Some(5.0)),
      (1L, ts(11, 0), 3L, None),
      (1L, ts(11, 30), 4L, Some(7.0)),
      (2L, ts(10, 0), 5L, None)) // other key: never inherits key 1
      .toDF("k", "t", "id", "v")
    val got = rows
      .withColumn("f", TimeSeriesOps.locf("k", Seq(col("t"), col("id")), col("v")))
      .orderBy($"k", $"t")
      .select($"f").as[Option[Double]].collect().toSeq
    assert(got == Seq(None, Some(5.0), Some(5.0), Some(7.0), None))
  }

  test("pointInTimeJoin: inclusive from, exclusive to, open current") {
    import org.apache.spark.sql.functions.col
    val dim = Seq(
      (1L, "a", ts(10, 0), Some(ts(12, 0)), 1),
      (1L, "b", ts(12, 0), None, 2))
      .toDF("key", "status", "valid_from", "valid_to", "version")
    val facts = Seq(
      (1L, ts(10, 0), 1L),  // at from → covered by a
      (1L, ts(11, 59), 2L), // inside a
      (1L, ts(12, 0), 3L),  // boundary: exclusive to → b
      (1L, ts(23, 0), 4L),  // open interval → b
      (1L, ts(9, 0), 5L),   // before first interval → dropped
      (2L, ts(11, 0), 6L))  // unknown key → dropped
      .toDF("u", "t", "fid")
    val got = TimeSeriesOps.pointInTimeJoin(facts, dim, "u", "t", "key")
      .select(col("fid"), col("status"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b"))
  }

  test("ohlcBars: open/close by (ts, tie) order, null rows dropped") {
    import org.apache.spark.sql.functions.{col, date_trunc}
    val rows = Seq(
      // day 1: same-instant tie broken by id → open = id 1's value
      (1L, ts(10, 0), 1L, Some(5.0)),
      (1L, ts(10, 0), 2L, Some(9.0)),
      (1L, ts(11, 0), 3L, Some(1.0)),
      (1L, ts(12, 0), 4L, Some(3.0)),
      // null value: must not become open/close/low
      (1L, ts(13, 0), 5L, None),
      // separate key, single row: all four prices equal
      (2L, ts(9, 30), 6L, Some(7.0)))
      .toDF("k", "t", "id", "v")
    val got = TimeSeriesOps.ohlcBars(rows, "k", "t", "v", "id",
        date_trunc("day", col("t")))
      .select("k", "open", "high", "low", "close", "n_events")
      .as[(Long, Double, Double, Double, Double, Long)].collect().toSeq
    assert(got == Seq((1L, 5.0, 9.0, 1.0, 3.0, 4L), (2L, 7.0, 7.0, 7.0, 7.0, 1L)))
  }

  test("scd2 intervals tile each key's timeline without overlap") {
    val ev = Seq.tabulate(40) { i =>
      (i % 3L, if ((i / 5) % 2 == 0) "a" else "b", ts(i % 24, i % 60), i.toLong)
    }.toDF("u", "status", "t", "id")
    val rows = TimeSeriesOps.scd2(ev, $"u", $"status", $"t", $"id")
      .orderBy($"key", $"version")
      .as[(Long, String, Timestamp, Option[Timestamp], Int)].collect()
    rows.groupBy(_._1).foreach { case (_, chain) =>
      chain.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"interval break: $a then $b")
          assert(a._2 != b._2, "consecutive intervals must change status")
        case _ => ()
      }
      assert(chain.last._4.isEmpty, "last interval must be open")
      assert(chain.map(_._5).toSeq == (1 to chain.length))
    }
  }
}

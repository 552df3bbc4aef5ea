package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

class TemporalPrecisionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("engine retains sub-microsecond digits the oracle truncates") {
    val raw = Tables.table(spark, "/root/testdata/sf0.001", "events")
    assert(raw.schema("ts").dataType == org.apache.spark.sql.types.LongType,
      "events.ts should arrive as raw nanos under nanosAsLong")
    val submicro = raw
      .select(sum(when(pmod($"ts", lit(1000L)) =!= 0L, 1L).otherwise(0L)).as("n"))
      .as[Long].head()
    assert(submicro > 0, "no sub-microsecond information in events — fixture changed?")
  }

  test("normalized events view truncates consistently with the raw nanos") {
    // integer div — `/ 1000L` is double division and drifts ±1 µs on
    // epoch nanos > 2^53 (the bug this spec now guards against)
    val raw = Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", expr("ts div 1000").as("micros"))
    val normalized = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", unix_micros($"ts").as("micros"))
    assert(raw.except(normalized).count() == 0)
    assert(normalized.except(raw).count() == 0)
  }
}

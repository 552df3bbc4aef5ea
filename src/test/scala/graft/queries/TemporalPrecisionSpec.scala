package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** events.ts has shipped in two physical encodings across fixture
  * generations: parquet TIMESTAMP(NANOS) (arriving as raw Long nanos
  * under `nanosAsLong`, rounds ≤6) and TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (arriving as TimestampNTZType, round 7+).
  * [[Tables.events]] normalizes BOTH to one session-TZ micro timestamp;
  * this spec pins that contract for whichever encoding the current
  * fixture carries, so a future flip back does not silently regress.
  */
class TemporalPrecisionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def raw = Tables.table(spark, "/root/testdata/sf0.001", "events")

  test("events.ts arrives in a supported physical encoding") {
    val dt = raw.schema("ts").dataType
    assert(dt == org.apache.spark.sql.types.LongType
        || dt == org.apache.spark.sql.types.TimestampNTZType,
      s"events.ts arrived as $dt — fixture changed to an encoding " +
        "Tables.events does not normalize; add a branch there and here")
  }

  test("normalized events view preserves micro precision exactly") {
    // integer `div`, not `/`, on the nanos branch: double division drifts
    // ±1 µs on epoch nanos > 2^53 (the bug this spec guards against)
    val rawMicros = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.select($"event_id", expr("ts div 1000").as("micros"))
      case _ =>
        raw.select($"event_id", unix_micros($"ts".cast("timestamp")).as("micros"))
    }
    val normalized = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", unix_micros($"ts").as("micros"))
    assert(rawMicros.except(normalized).count() == 0)
    assert(normalized.except(rawMicros).count() == 0)
    // the fixture genuinely exercises sub-second precision (constant
    // whole-second timestamps would make the compare above vacuous)
    val subSecond = normalized
      .select(sum(when(pmod($"micros", lit(1000000L)) =!= 0L, 1L).otherwise(0L)).as("n"))
      .as[Long].head()
    assert(subSecond > 0, "no sub-second information in events — fixture changed?")
  }
}

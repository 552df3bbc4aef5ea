package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.tables.Tables

/** Temporal precision + calendar functions + null semantics — the
  * remaining ANSI surface: event timestamps at full stored precision
  * (raw nanos when the fixture ships TIMESTAMP(NANOS), native micros
  * when it ships TIMESTAMP(MICROS) — q47 handles both), the date-part
  * family, and three-valued-logic handling.
  */
object TemporalQueries {

  // ------------------------------------------------- q47_event_precision
  // Precision floor of the event scan. When the fixture ships parquet
  // TIMESTAMP(NANOS) the engine reads raw nanos (legacy.parquet
  // .nanosAsLong) so nothing is truncated at rest; when it ships
  // TIMESTAMP(MICROS) (round-7+ fixtures) the native micro path is
  // already lossless. Either way the oracle compare happens at micro
  // precision — DuckDB's parquet reader truncates nanos to micros.
  private def q47Nanos(s: SparkSession, d: String): DataFrame = {
    val raw = Tables.table(s, d, "events")
    val nanos = raw.schema("ts").dataType match {
      case LongType => col("ts")
      // fallback (micros timestamp): widen back to nanos scale
      case _ => unix_micros(col("ts").cast("timestamp")) * 1000L
    }
    raw.select(nanos.as("ts_nanos"))
      .agg(
        // integer `div`, NOT `/`: Column./ is double division, and epoch
        // nanos (~1.7e18) exceed a double's 53-bit mantissa — the rounded
        // quotient floors to an off-by-one microsecond at some scales
        expr("min(ts_nanos) div 1000").as("min_micros"),
        expr("max(ts_nanos) div 1000").as("max_micros"),
        count(lit(1)).as("n"))
  }
  // (nanos-tail preservation itself is asserted in TemporalPrecisionSpec —
  // the oracle physically cannot see sub-micro digits)

  private val q47Sql =
    """SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS min_micros,
      |  CAST(max(epoch_us(ts)) AS BIGINT) AS max_micros,
      |  count(*) AS n
      |FROM events""".stripMargin

  // ---------------------------------------------------- q48_date_parts
  private def q48DateParts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        (weekday(col("o_orderdate")) + 1).as("isodow"),
        date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd").as("week_start"))
      .orderBy(col("o_orderkey"))

  private val q48Sql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(isodow(o_orderdate) AS INT) AS isodow,
      |  strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------- q49_null_semantics
  // Three-valued logic: NULLIF-manufactured nulls, coalesce, null-safe
  // equality, and null-aware aggregation.
  private def q49Nulls(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("bal_or_null", nullif(col("c_acctbal"), lit(0.0)))
      .withColumn("seg_or_null", nullif(col("c_mktsegment"), lit("BUILDING")))
      .groupBy(col("c_nationkey"))
      .agg(
        count(col("seg_or_null")).as("n_nonnull_seg"),
        count(lit(1)).as("n_rows"),
        sum(coalesce(col("bal_or_null"), lit(0.0)).cast("decimal(18,2)"))
          .cast("double").as("sum_bal"),
        sum(when(col("seg_or_null") <=> lit(null), 1).otherwise(0)).cast("long")
          .as("n_building"))
      .orderBy(col("c_nationkey"))

  private val q49Sql =
    """SELECT c_nationkey,
      |  count(nullif(c_mktsegment, 'BUILDING')) AS n_nonnull_seg,
      |  count(*) AS n_rows,
      |  CAST(sum(CAST(coalesce(nullif(c_acctbal, 0.0), 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
      |  CAST(sum(CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL
      |               THEN 1 ELSE 0 END) AS BIGINT) AS n_building
      |FROM customer GROUP BY 1 ORDER BY c_nationkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q47_event_precision", q47Nanos, Some(q47Sql)),
    Q("q48_date_parts", q48DateParts, Some(q48Sql)),
    Q("q49_null_semantics", q49Nulls, Some(q49Sql)),
  )
}

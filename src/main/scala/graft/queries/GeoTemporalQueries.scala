package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.GeoOps
import graft.tables.Tables

/** Round-3 engine surface, part 2: geo nearest-neighbour (the reference
  * dimension's lat/lon, `/root/reference/database/schema.sql:42-43`),
  * time-series gap-fill with linear interpolation, Z-order lake
  * clustering, and SCD2 dimension-history build (the reference's
  * date_created/date_updated columns, `database/schema.sql:28,40`, imply
  * exactly this changes-over-time semantics).
  *
  * Exactness discipline: coordinates come from integer Knuth hashes, the
  * haversine uses one explicit deg→rad constant and `s*s` squares so both
  * engines run the same IEEE sequence, distances are rounded to 2
  * decimals BEFORE ranking (1-ulp libm differences cannot flip an
  * argmin), interpolation runs on epoch-second integers, and the Z-order
  * interleave is pure 64-bit integer math emitted from one generator for
  * both engines.
  */
object GeoTemporalQueries {

  // ------------------------------------------------------ q84_geo_nearest
  // Nearest-supplier-to-customer: broadcast the supplier dim, compute
  // haversine per pair map-side, then argmin via min(struct(dist, key)) —
  // a partial-aggregatable (map-side combine) pattern that never shuffles
  // the pair matrix, unlike the window row_number idiom.
  //
  // The customer side is hashed by c_custkey BEFORE the cross join: the
  // argmin groupBy needs that exact exchange anyway, and a broadcast
  // nested-loop join preserves its streamed side's partitioning, so
  // hoisting it above the join is byte-neutral (the post-join partial
  // agg emits one row per custkey per partition either way — each key
  // lives in exactly one partition) while the |cust|·|supp| haversine
  // evaluation fans out across the session's cores instead of riding
  // the scan's task layout (guide §2.4 shared exchange; measured 2→1
  // Exchange and the 1.57 s single-task join stage parallelized —
  // OPTIMIZATION_r16.md).
  private def q84GeoNearest(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"),
        GeoOps.syntheticLat(col("c_custkey"), 11L).as("c_lat"),
        GeoOps.syntheticLon(col("c_custkey"), 22L).as("c_lon"))
      // explicit count (the session's core parallelism, not a constant):
      // without it AQE would coalesce this kilobyte exchange back to one
      // partition and re-serialize the pair matrix it exists to fan out
      .repartition(s.sparkContext.defaultParallelism, col("c_custkey"))
    val supp = Tables.supplier(s, d)
      .select(col("s_suppkey"),
        GeoOps.syntheticLat(col("s_suppkey"), 33L).as("s_lat"),
        GeoOps.syntheticLon(col("s_suppkey"), 44L).as("s_lon"))
    cust.crossJoin(broadcast(supp))
      .withColumn("dist_km",
        round(GeoOps.haversineKm(col("c_lat"), col("c_lon"), col("s_lat"), col("s_lon")), 2))
      .groupBy(col("c_custkey"))
      .agg(min(struct(col("dist_km"), col("s_suppkey"))).as("best"))
      .select(col("c_custkey"),
        col("best.s_suppkey").as("s_suppkey"),
        col("best.dist_km").as("dist_km"))
      .orderBy(col("c_custkey"))
  }

  private val q84Sql = {
    // (x % m + m) % m mirrors Spark's pmod for negative keys — a plain
    // sign-following % would diverge from the engine on negative ids
    val u = (key: String, salt: Int) =>
      s"CAST((((($key % 2147483648 + 2147483648) % 2147483648) * 2654435761 + $salt) % 4294967296) AS DOUBLE) / 4294967296.0"
    val hav =
      """2.0 * 6371.0088 * asin(sqrt(least(
        |  sin((s_lat - c_lat) * 0.017453292519943295 / 2.0) * sin((s_lat - c_lat) * 0.017453292519943295 / 2.0)
        |  + cos(c_lat * 0.017453292519943295) * cos(s_lat * 0.017453292519943295)
        |    * sin((s_lon - c_lon) * 0.017453292519943295 / 2.0) * sin((s_lon - c_lon) * 0.017453292519943295 / 2.0),
        |  1.0)))""".stripMargin
    s"""WITH c AS (
       |  SELECT c_custkey,
       |    -60.0 + ${u("c_custkey", 11)} * 120.0 AS c_lat,
       |    -180.0 + ${u("c_custkey", 22)} * 360.0 AS c_lon
       |  FROM customer WHERE c_custkey % 10 = 0),
       |s AS (
       |  SELECT s_suppkey,
       |    -60.0 + ${u("s_suppkey", 33)} * 120.0 AS s_lat,
       |    -180.0 + ${u("s_suppkey", 44)} * 360.0 AS s_lon
       |  FROM supplier),
       |pairs AS (
       |  SELECT c_custkey, s_suppkey, round($hav, 2) AS dist_km
       |  FROM c CROSS JOIN s),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY c_custkey
       |    ORDER BY dist_km, s_suppkey) AS rn
       |  FROM pairs)
       |SELECT c_custkey, s_suppkey, dist_km
       |FROM ranked WHERE rn = 1 ORDER BY c_custkey""".stripMargin
  }

  // ---------------------------------------------------------- q85_gapfill
  // Hourly gap-fill + linear interpolation: per-user hourly avg(value)
  // series, missing hours materialized from sequence() and filled by
  // interpolating between the bracketing present hours on the epoch-
  // second axis. The dense-range explode and both fill windows partition
  // per user — one shuffle, arbitrarily many users in parallel.
  private def q85Gapfill(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .filter(col("user_id") % 10 === 0)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(col("value").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("val"))
    // no round() on val_filled: every op is exact-input IEEE (decimal-
    // exact averages, integer epoch deltas) so both engines produce the
    // bit-identical double; rounding would only ADD tie-break skew
    graft.ops.TimeSeriesOps
      .gapFillInterpolate(hourly, "user_id", "h", "val")
      .select(
        col("user_id"), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("is_gap"), col("val_filled"))
      .orderBy(col("user_id"), col("h"))
  }

  private val q85Sql =
    """WITH hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h,
      |    count(*) AS n_events,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS val
      |  FROM events WHERE user_id % 10 = 0 GROUP BY 1, 2),
      |dense AS (
      |  SELECT user_id,
      |    unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
      |  FROM hourly GROUP BY user_id),
      |j AS (
      |  SELECT d.user_id, d.h, hourly.n_events, hourly.val
      |  FROM dense d LEFT JOIN hourly
      |    ON d.user_id = hourly.user_id AND d.h = hourly.h),
      |f AS (
      |  SELECT *,
      |    last_value(CASE WHEN val IS NOT NULL THEN struct_pack(h := h, v := val) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY h
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
      |    first_value(CASE WHEN val IS NOT NULL THEN struct_pack(h := h, v := val) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY h
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
      |  FROM j)
      |SELECT user_id, h,
      |  coalesce(n_events, 0) AS n_events,
      |  val IS NULL AS is_gap,
      |  CASE WHEN val IS NOT NULL THEN val ELSE
      |    p.v + (n.v - p.v) *
      |      (CAST(CAST(floor(epoch(h)) AS BIGINT) - CAST(floor(epoch(p.h)) AS BIGINT) AS DOUBLE) /
      |       CAST(CAST(floor(epoch(n.h)) AS BIGINT) - CAST(floor(epoch(p.h)) AS BIGINT) AS DOUBLE))
      |  END AS val_filled
      |FROM f ORDER BY user_id, h""".stripMargin

  // ----------------------------------------------------------- q86_zorder
  // Z-order (Morton) clustering key over two independent dimensions of
  // the part table, then 32 equal-frequency clusters in curve order. The
  // per-cluster min/max spans on BOTH source dims stay narrow — exactly
  // the footer-stats property that makes a Z-ordered lake prune scans on
  // either predicate. ntile over a total order (z, key) is deterministic.
  private def q86Zorder(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).select(
      col("p_partkey"),
      (col("p_partkey") % 65536).as("x"),
      (floor(col("p_retailprice")).cast("long") % 65536).as("y"))
    val z = p.withColumn("z", GeoOps.zorderKey(col("x"), col("y")))
    z.withColumn("bucket",
        ntile(32).over(Window.orderBy(col("z"), col("p_partkey"))))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        min(col("z")).as("min_z"), max(col("z")).as("max_z"))
      .orderBy(col("bucket"))
  }

  private val q86Sql = {
    val terms = GeoOps.zorderSqlTerms("x", "y")
    s"""WITH base AS (
       |  SELECT p_partkey, p_partkey % 65536 AS x,
       |    CAST(floor(p_retailprice) AS BIGINT) % 65536 AS y
       |  FROM part),
       |zed AS (
       |  SELECT p_partkey, x, y, $terms AS z FROM base),
       |tiled AS (
       |  SELECT *, ntile(32) OVER (ORDER BY z, p_partkey) AS bucket FROM zed)
       |SELECT bucket, count(*) AS n,
       |  min(x) AS min_x, max(x) AS max_x,
       |  min(y) AS min_y, max(y) AS max_y,
       |  min(z) AS min_z, max(z) AS max_z
       |FROM tiled GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  // ------------------------------------------------------------- q87_scd2
  // SCD type-2 history build: collapse an event stream to status-change
  // rows, then stitch validity intervals with lead(). valid_to of the
  // latest row is NULL (open interval) — the reference's date_updated
  // semantics made queryable as of any point in time.
  private def q87Scd2(s: SparkSession, d: String): DataFrame =
    graft.ops.TimeSeriesOps.scd2(
        Tables.events(s, d).filter(col("user_id") % 20 === 0),
        key = col("user_id"), status = col("event_type"),
        ts = col("ts"), tie = col("event_id"))
      .withColumnRenamed("key", "user_id")
      .orderBy(col("user_id"), col("version"))

  private val q87Sql =
    """WITH marked AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev
      |  FROM events WHERE user_id % 20 = 0),
      |changes AS (
      |  SELECT * FROM marked WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type AS status, ts AS valid_from,
      |  lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS valid_to,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS INT) AS version
      |FROM changes ORDER BY user_id, version""".stripMargin

  // ------------------------------------------------------- q130_geo_grid
  // The scale path for q84: nearest supplier WITHIN 350 km of every
  // customer (no sampling), grid-cell bucketed — each customer meets only
  // the suppliers in its 3×3 cell neighbourhood instead of all of them.
  // Same synthetic coordinates, haversine, rounding, and tie-break as
  // q84, so the DuckDB oracle is the brute-force form with the radius
  // predicate: grid bucketing is lossless within the radius bound and
  // must be invisible in the result. q84 at sf1 is 150 M haversines;
  // this is ~6 M, and the gap widens quadratically with SF.
  private val GridRadiusKm = 350.0

  private def q130GeoGrid(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"),
        GeoOps.syntheticLat(col("c_custkey"), 11L).as("c_lat"),
        GeoOps.syntheticLon(col("c_custkey"), 22L).as("c_lon"))
    val supp = Tables.supplier(s, d)
      .select(col("s_suppkey"),
        GeoOps.syntheticLat(col("s_suppkey"), 33L).as("s_lat"),
        GeoOps.syntheticLon(col("s_suppkey"), 44L).as("s_lon"))
    GeoOps.gridNearestWithin(
        cust, "c_custkey", "c_lat", "c_lon",
        supp, "s_suppkey", "s_lat", "s_lon",
        radiusKm = GridRadiusKm)
      .orderBy(col("c_custkey"))
  }

  private val q130Sql = {
    val u = (key: String, salt: Int) =>
      s"CAST((((($key % 2147483648 + 2147483648) % 2147483648) * 2654435761 + $salt) % 4294967296) AS DOUBLE) / 4294967296.0"
    val hav =
      """2.0 * 6371.0088 * asin(sqrt(least(
        |  sin((s_lat - c_lat) * 0.017453292519943295 / 2.0) * sin((s_lat - c_lat) * 0.017453292519943295 / 2.0)
        |  + cos(c_lat * 0.017453292519943295) * cos(s_lat * 0.017453292519943295)
        |    * sin((s_lon - c_lon) * 0.017453292519943295 / 2.0) * sin((s_lon - c_lon) * 0.017453292519943295 / 2.0),
        |  1.0)))""".stripMargin
    s"""WITH c AS (
       |  SELECT c_custkey,
       |    -60.0 + ${u("c_custkey", 11)} * 120.0 AS c_lat,
       |    -180.0 + ${u("c_custkey", 22)} * 360.0 AS c_lon
       |  FROM customer),
       |s AS (
       |  SELECT s_suppkey,
       |    -60.0 + ${u("s_suppkey", 33)} * 120.0 AS s_lat,
       |    -180.0 + ${u("s_suppkey", 44)} * 360.0 AS s_lon
       |  FROM supplier),
       |pairs AS (
       |  SELECT c_custkey, s_suppkey, round($hav, 2) AS dist_km
       |  FROM c CROSS JOIN s),
       |near AS (
       |  SELECT * FROM pairs WHERE dist_km <= $GridRadiusKm),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY c_custkey
       |    ORDER BY dist_km, s_suppkey) AS rn
       |  FROM near)
       |SELECT c_custkey, s_suppkey, dist_km
       |FROM ranked WHERE rn = 1 ORDER BY c_custkey""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q84_geo_nearest", q84GeoNearest, Some(q84Sql)),
    Q("q130_geo_grid", q130GeoGrid, Some(q130Sql)),
    Q("q85_gapfill", q85Gapfill, Some(q85Sql)),
    Q("q86_zorder", q86Zorder, Some(q86Sql)),
    Q("q87_scd2", q87Scd2, Some(q87Sql)),
  )
}

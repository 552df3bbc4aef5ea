package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Product/behavioral analytics over the events stream plus exact
  * distributed statistics — the query surface a radar-traffic warehouse
  * grows once the ingest (SURVEY §2) is solved: staged funnels, cohort
  * retention, trend regression, interval concurrency, outlier flagging,
  * and weighted percentiles.
  *
  * Oracle-parity rules used throughout (see q71/q40 precedents): every
  * double aggregate routes through DECIMAL power sums (order-independent
  * under any partitioning), every derived double keeps an identical IEEE
  * op sequence on both engines, every output ends in a total order.
  */
object AnalyticsQueries {

  // --------------------------------------------------------- q91_funnel
  // Staged conversion funnel view → click → purchase: stage k counts
  // users whose first stage-k event strictly follows their first
  // stage-(k-1) event. Each stage is a per-user min — shuffles carry one
  // row per user, and the stage joins are co-partitioned on user_id (a
  // 1000-executor run re-uses the same hash partitioning end to end).
  private def q91Funnel(s: SparkSession, d: String): DataFrame =
    graft.ops.AnalyticsOps.funnel(Tables.events(s, d),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))

  private val q91Sql =
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |      JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |      JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1),
      |n AS (SELECT 1 AS stage, 'view' AS step, count(*) AS users FROM v
      |      UNION ALL SELECT 2, 'click', count(*) FROM c
      |      UNION ALL SELECT 3, 'purchase', count(*) FROM p)
      |SELECT stage, step, users,
      |  round(CAST(users AS DOUBLE) / CAST(max(users) OVER () AS DOUBLE), 6)
      |    AS pct_of_top
      |FROM n ORDER BY stage""".stripMargin

  // ------------------------------------------------------ q92_retention
  // Weekly cohort retention: cohort = ISO week of a user's first event;
  // cell (cohort, k) counts users active in cohort-week + k. The
  // activity set is distinct (user, week) — shuffle size is bounded by
  // users × weeks regardless of event volume.
  private def q92Retention(s: SparkSession, d: String): DataFrame =
    graft.ops.AnalyticsOps.cohortRetention(Tables.events(s, d), "user_id", "ts")

  private val q92Sql =
    """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
      |           FROM events GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
      |j AS (SELECT f.cw,
      |        CAST(date_diff('day', CAST(f.cw AS DATE), CAST(a.wk AS DATE)) // 7 AS INT)
      |          AS week_offset
      |      FROM a JOIN f ON a.user_id = f.user_id)
      |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, week_offset,
      |  count(*) AS active_users
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------- q93_trend
  // Per-nation least-squares revenue trend: slope/intercept of order
  // totalprice vs days-since-1992, assembled from exact integer/DECIMAL
  // power sums (x is an int day index, x·y an exact decimal product) so
  // the only doubles are the final closed-form divisions — identical
  // IEEE sequence on both engines. One fact shuffle of |nations| rows.
  private def q93Trend(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
    graft.ops.AnalyticsOps.linearTrend(o, "n_name",
      datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date")),
      col("o_totalprice"))
  }

  private val q93Sql =
    """WITH o AS (
      |  SELECT n_name,
      |    date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS y
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |m AS (
      |  SELECT n_name, count(*) AS n,
      |    CAST(sum(x) AS DOUBLE) AS sx,
      |    CAST(sum(x*x) AS DOUBLE) AS sxx,
      |    CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x AS DECIMAL(10,0)) * y) AS DOUBLE) AS sxy
      |  FROM o GROUP BY 1)
      |SELECT n_name, n,
      |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
      |  round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6)
      |    AS intercept
      |FROM m ORDER BY n_name""".stripMargin

  // ---------------------------------------------------- q94_concurrency
  // Peak interval concurrency via sweep line: each event occupies
  // [ts, ts + (⌊value⌋+1) minutes); unpivot to ±1 boundary deltas, run a
  // per-type ordered prefix sum, report the peak and its earliest
  // instant. Ends sort before starts at the same instant (delta -1 < +1)
  // so back-to-back intervals don't count as concurrent. Windows
  // partition by event_type — streams sweep independently in parallel.
  private def q94Concurrency(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.events(s, d).select(
      col("event_id"), col("event_type"), col("ts"),
      // exact integer micros arithmetic on both engines
      timestamp_micros(unix_micros(col("ts")) +
        (floor(col("value")).cast("long") + 1L) * 60000000L).as("ts_end"))
    graft.ops.AnalyticsOps.peakConcurrency(
      iv, "event_type", "ts", "ts_end", "event_id")
  }

  private val q94Sql =
    """WITH iv AS (
      |  SELECT event_id, event_type, ts,
      |    ts + to_seconds(60 * (CAST(floor(value) AS BIGINT) + 1)) AS ts_end
      |  FROM events),
      |b AS (
      |  SELECT event_type, ts AS t, 1 AS delta, event_id FROM iv
      |  UNION ALL
      |  SELECT event_type, ts_end, -1, event_id FROM iv),
      |r AS (
      |  SELECT event_type, t,
      |    sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM b),
      |pk AS (SELECT event_type, max(run) AS peak FROM r GROUP BY 1)
      |SELECT r.event_type, CAST(pk.peak AS INT) AS peak, min(r.t) AS peak_ts
      |FROM r JOIN pk ON r.event_type = pk.event_type AND r.run = pk.peak
      |GROUP BY r.event_type, pk.peak ORDER BY r.event_type""".stripMargin

  // ------------------------------------------------------- q95_outliers
  // Per-user z-score outliers (|z| > 2) with DECIMAL-exact moments: the
  // per-user mean/variance come from decimal power sums, the comparison
  // runs as dev² > 4·var so no sqrt enters the predicate, and every
  // float op repeats the same sequence on both engines. Moments and the
  // flagging join shuffle on user_id once each.
  private def q95Outliers(s: SparkSession, d: String): DataFrame =
    graft.ops.AnalyticsOps.zscoreOutliers(
      Tables.events(s, d), "user_id", "value", "event_id")

  private val q95Sql =
    """WITH m AS (
      |  SELECT user_id, count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
      |    CAST(sum(CAST(value*value AS DECIMAL(28,6))) AS DOUBLE) AS svv
      |  FROM events GROUP BY 1)
      |SELECT e.event_id, e.user_id, e.value,
      |  round((e.value - m.sv/m.n) * (e.value - m.sv/m.n)
      |        / ((m.svv - m.sv*m.sv/m.n) / m.n), 6) AS z2
      |FROM events e JOIN m ON e.user_id = m.user_id
      |WHERE m.n >= 10
      |  AND (m.svv - m.sv*m.sv/m.n) / m.n > 0
      |  AND (e.value - m.sv/m.n) * (e.value - m.sv/m.n)
      |      > 4 * ((m.svv - m.sv*m.sv/m.n) / m.n)
      |ORDER BY e.event_id""".stripMargin

  // ------------------------------------------------ q96_weighted_median
  // Exact weighted median (quantity-weighted extendedprice per return
  // flag): cumulative integer weights along a totally ordered window,
  // first price where 2·cum ≥ total. All-integer weight arithmetic —
  // no float accumulation at any scale. One shuffle (the per-flag sort).
  private def q96WeightedMedian(s: SparkSession, d: String): DataFrame =
    graft.ops.AnalyticsOps.weightedMedian(
      Tables.lineitem(s, d)
        .select(col("l_returnflag").as("rf"), col("l_extendedprice").as("p"),
          col("l_quantity"), col("l_orderkey"), col("l_linenumber")),
      "rf", "p", "l_quantity", Seq("l_orderkey", "l_linenumber"))

  private val q96Sql =
    """WITH w AS (
      |  SELECT l_returnflag AS rf, l_extendedprice AS p,
      |    CAST(floor(l_quantity) AS BIGINT) AS q, l_orderkey, l_linenumber
      |  FROM lineitem),
      |c AS (
      |  SELECT rf, p,
      |    sum(q) OVER (PARTITION BY rf ORDER BY p, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(q) OVER (PARTITION BY rf) AS tot
      |  FROM w)
      |SELECT rf, min(p) AS weighted_median
      |FROM c WHERE 2*cum >= tot GROUP BY rf ORDER BY rf""".stripMargin

  // ----------------------------------------------------- q101_range_frame
  // Time-RANGE window frame (vs q30's ROWS frames): trailing-24h event
  // count and value sum per user, frame defined on the epoch-second axis
  // so ties at the same second are all peers — deterministic without any
  // tiebreak. The decimal frame sum keeps both engines bit-identical.
  private def q101RangeFrame(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        unix_timestamp(col("ts")).as("sec"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-86400L, 0L)
    e.withColumn("n_24h", count(lit(1)).over(w))
      .withColumn("sum_24h",
        sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("n_24h"),
        col("sum_24h"))
      .orderBy(col("event_id"))
  }

  private val q101Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, value,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events)
      |SELECT event_id, user_id,
      |  count(*) OVER w AS n_24h,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_24h
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec
      |             RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------- q102_array_hof
  // Higher-order array functions end to end: per-order sorted quantity
  // array → filter (≥10) → transform (×2) → fold to a sum, plus the
  // rendered array. HOFs are interpreter-evaluated (CodegenFallback) —
  // fine here because the arrays are tiny post-aggregation; hot-path
  // loops belong in native expressions (see functions.*).
  private def q102ArrayHof(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity").cast("long"))).as("qs"))
      .select(col("l_orderkey"),
        expr("aggregate(transform(filter(qs, x -> x >= 10), x -> x * 2)," +
          " 0L, (acc, x) -> acc + x)").as("big_doubled_sum"),
        array_join(expr("transform(filter(qs, x -> x >= 10), x -> x * 2)"),
          ",").as("big_doubled"))
      .orderBy(col("l_orderkey"))

  private val q102Sql =
    """WITH a AS (
      |  SELECT l_orderkey,
      |    list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
      |  FROM lineitem GROUP BY 1)
      |SELECT l_orderkey,
      |  CAST(coalesce(list_aggregate(
      |    list_transform(list_filter(qs, x -> x >= 10), x -> x * 2),
      |    'sum'), 0) AS BIGINT) AS big_doubled_sum,
      |  coalesce(array_to_string(
      |    list_transform(list_filter(qs, x -> x >= 10), x -> x * 2),
      |    ','), '') AS big_doubled
      |FROM a ORDER BY l_orderkey""".stripMargin

  // ------------------------------------------------------------ q103_chi2
  // Chi-square independence of market segment × order priority — the
  // categorical association test over the order fact; marginals come
  // from windows over the tiny cell table, and the term reduce sums
  // DECIMAL so the statistic is partitioning-independent.
  private def q103Chi2(s: SparkSession, d: String): DataFrame =
    graft.ops.AnalyticsOps.chiSquare(
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey")),
      "c_mktsegment", "o_orderpriority")

  private val q103Sql =
    """WITH sparse AS (
      |  SELECT c_mktsegment, o_orderpriority, count(*) AS obs
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IS NOT NULL AND o_orderpriority IS NOT NULL
      |  GROUP BY 1, 2),
      |cells AS (
      |  SELECT av.c_mktsegment, bv.o_orderpriority, coalesce(s.obs, 0) AS obs
      |  FROM (SELECT DISTINCT c_mktsegment FROM sparse) av
      |  CROSS JOIN (SELECT DISTINCT o_orderpriority FROM sparse) bv
      |  LEFT JOIN sparse s ON av.c_mktsegment = s.c_mktsegment
      |    AND bv.o_orderpriority = s.o_orderpriority),
      |t AS (
      |  SELECT obs,
      |    sum(obs) OVER (PARTITION BY c_mktsegment) AS rt,
      |    sum(obs) OVER (PARTITION BY o_orderpriority) AS ct,
      |    sum(obs) OVER () AS n,
      |    c_mktsegment, o_orderpriority
      |  FROM cells),
      |terms AS (
      |  SELECT n, c_mktsegment, o_orderpriority,
      |    CAST((obs - CAST(rt*ct AS DOUBLE)/n) * (obs - CAST(rt*ct AS DOUBLE)/n)
      |         / (CAST(rt*ct AS DOUBLE)/n) AS DECIMAL(24,8)) AS term
      |  FROM t)
      |SELECT round(CAST(sum(term) AS DOUBLE), 6) AS chi2,
      |  CAST((count(DISTINCT c_mktsegment) - 1)
      |       * (count(DISTINCT o_orderpriority) - 1) AS INT) AS dof,
      |  CAST(max(n) AS BIGINT) AS n
      |FROM terms""".stripMargin

  // -------------------------------------------------------- q107_pagerank
  // Integer-arithmetic PageRank (3 rounds, damping 0.85) over the
  // customer↔supplier trade graph (both directions, so no dangling
  // nodes). Ranks are BIGINT trillionths with floor division — zero
  // float accumulation, so the result is bit-identical across
  // partitionings and engines; the oracle unrolls the same integer
  // recurrence as three CTE iterations.
  private def q107PageRank(s: SparkSession, d: String): DataFrame = {
    val edges = TradeGraph.edges(s, d)
    // broadcastRanks: the node set here is dimension-sized (customers +
    // suppliers), the known-safe case for the per-iteration broadcast
    graft.ops.GraphOps.pageRankInt(edges, "src", "dst", iters = 3,
      broadcastRanks = true)
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
      .select(col("node"), col("rank"))
  }

  private val q107Sql = {
    def iter(prev: String, out: String) =
      s"""$out AS (
         |  SELECT n.node,
         |    CAST((15 * (1000000000000 // (SELECT n FROM params))) // 100
         |      + (85 * coalesce(m.inmass, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum(p.rank // o.outdeg) AS inmass
         |    FROM e JOIN $prev p ON e.src = p.node
         |    JOIN outdeg o ON e.src = o.src
         |    GROUP BY e.dst) m ON n.node = m.dst)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2+1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
       |outdeg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |params AS (SELECT count(*) AS n FROM nodes),
       |p0 AS (SELECT node,
       |  CAST(1000000000000 // (SELECT n FROM params) AS BIGINT) AS rank
       |  FROM nodes),
       |${iter("p0", "p1")},
       |${iter("p1", "p2")},
       |${iter("p2", "p3")}
       |SELECT node, rank FROM p3
       |ORDER BY rank DESC, node LIMIT 20""".stripMargin
  }

  // ------------------------------------------------------- q126_ab_lift
  // Experiment readout: user_id parity as the variant split, purchase as
  // conversion — per-variant entity/converter counts reduce to four
  // integers, then one closed-form two-proportion z. Identical IEEE
  // sequence both engines; zero-variance pools yield NULL z.
  private def q126AbLift(s: SparkSession, d: String): DataFrame =
    graft.ops.AnalyticsOps.abLift(
      Tables.events(s, d).withColumn("v", col("user_id") % 2),
      variant = "v", entity = "user_id",
      converted = col("event_type") === "purchase")

  private val q126Sql =
    """WITH pe AS (
      |  SELECT user_id % 2 AS v, user_id,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
      |  FROM events GROUP BY 1, 2),
      |pv AS (SELECT v, count(*) AS n, CAST(sum(c) AS BIGINT) AS conv
      |       FROM pe GROUP BY 1),
      |pvt AS (SELECT *, v = min(v) OVER () AS isa FROM pv),
      |one AS (
      |  SELECT min(v) AS variant_a, max(v) AS variant_b,
      |    CAST(sum(CASE WHEN isa THEN n END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN isa THEN conv END) AS BIGINT) AS conv_a,
      |    CAST(sum(CASE WHEN NOT isa THEN n END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN NOT isa THEN conv END) AS BIGINT) AS conv_b
      |  FROM pvt),
      |calc AS (
      |  SELECT *, CAST(conv_a AS DOUBLE) / n_a AS ra,
      |    CAST(conv_b AS DOUBLE) / n_b AS rb,
      |    CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS pool
      |  FROM one),
      |c2 AS (
      |  SELECT *, sqrt(pool * (1.0 - pool) *
      |    (CAST(1 AS DOUBLE)/n_a + CAST(1 AS DOUBLE)/n_b)) AS den
      |  FROM calc)
      |SELECT variant_a, variant_b, n_a, conv_a, n_b, conv_b,
      |  round(ra, 6) AS rate_a, round(rb, 6) AS rate_b,
      |  round(rb - ra, 6) AS lift,
      |  CASE WHEN den > 0 THEN round((rb - ra) / den, 6) END AS z
      |FROM c2""".stripMargin

  // --------------------------------------------------------- q134_hll_rollup
  // Mergeable-cardinality rollup (graft.analytics.Sketches): HLL sketches
  // built at the (source, lang) grain, UNIONED — not recomputed — to
  // per-source estimates, next to the exact distinct for visible error.
  // Estimates are DataSketches-implementation-specific → no DuckDB
  // oracle; SketchSpec pins merge-vs-recompute drift ≤1%, a ≤2% error
  // bound vs exact for any grouping of the input, and the at-rest
  // parquet round-trip of sketch bytes.
  private def q134HllRollup(s: SparkSession, d: String): DataFrame =
    graft.analytics.Sketches.distinctDocsBySource(Tables.documents(s, d))

  // ----------------------------------------------------- q143_kll_rollup
  // Mergeable-quantile rollup (graft.functions.NativeSketches.KllAgg):
  // KLL(200) sketches of l_extendedprice built at the (returnflag,
  // linestatus) grain, MERGED — not recomputed — to per-flag p50/p95/p99
  // next to the exact count. The percentile analog of q134: exact
  // percentiles don't re-aggregate, sketches do, with the same rank-error
  // bound after any merge. Estimates are randomized-compaction-specific →
  // no DuckDB oracle; QuantileSketchSpec pins the merged rank error vs
  // the exact distribution, the parquet round-trip, and the partial-agg
  // (sketch-bytes-shuffle) plan.
  private def q143KllRollup(s: SparkSession, d: String): DataFrame = {
    import graft.analytics.Sketches
    val li = Tables.lineitem(s, d)
    val fine = Sketches.quantileSketchBy(
      li, col("l_extendedprice"), 200, col("l_returnflag"), col("l_linestatus"))
    val est = Sketches.quantileRollup(
      fine, Seq(0.5, 0.95, 0.99), "q", 200, col("l_returnflag"))
    val exact = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    est.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n"),
        round(col("q").getItem(0), 2).as("p50"),
        round(col("q").getItem(1), 2).as("p95"),
        round(col("q").getItem(2), 2).as("p99"))
      .orderBy(col("l_returnflag"))
  }

  val all: Seq[Q] = Seq(
    Q("q134_hll_rollup", q134HllRollup, None),
    Q("q143_kll_rollup", q143KllRollup, None),
    Q("q91_funnel", q91Funnel, Some(q91Sql)),
    Q("q92_retention", q92Retention, Some(q92Sql)),
    Q("q93_trend", q93Trend, Some(q93Sql)),
    Q("q94_concurrency", q94Concurrency, Some(q94Sql)),
    Q("q95_outliers", q95Outliers, Some(q95Sql)),
    Q("q96_weighted_median", q96WeightedMedian, Some(q96Sql)),
    Q("q101_range_frame", q101RangeFrame, Some(q101Sql)),
    Q("q102_array_hof", q102ArrayHof, Some(q102Sql)),
    Q("q103_chi2", q103Chi2, Some(q103Sql)),
    Q("q107_pagerank", q107PageRank, Some(q107Sql)),
    Q("q126_ab_lift", q126AbLift, Some(q126Sql)))
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** Advanced analytic surface: window-function families, multi-dim
  * aggregation (cube / grouping sets), pivot/unpivot, correlated and
  * scalar subqueries (via the SQL front end), range and as-of joins,
  * exact percentiles, sessionization. Everything oracle-checked.
  *
  * The as-of join is implemented the scalable way (union + sort +
  * last-carry-forward window — one shuffle, no n² pair join) and
  * oracle-checked against DuckDB's naive join+max formulation.
  */
object AdvancedQueries {

  private def sumD2(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  // --------------------------------------------------------------- q28_cube
  private def q28Cube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sumD2(col("o_totalprice")).as("sum_price"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  private val q28Sql =
    """SELECT c_mktsegment, o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY CUBE (c_mktsegment, o_orderstatus)
      |ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  // ------------------------------------------------------ q29_grouping_sets
  // Exercises the SQL front end (spark.sql over registered views).
  private def q29Gsets(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("graft_customer")
    Tables.nation(s, d).createOrReplaceTempView("graft_nation")
    s.sql(
      """SELECT n_name, c_mktsegment, count(*) AS n
        |FROM graft_customer JOIN graft_nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin)
  }

  private val q29Sql =
    """SELECT n_name, c_mktsegment, count(*) AS n
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
      |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin

  // ------------------------------------------------------- q30_running_sum
  private def q30Running(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("running_total"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q30Sql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
      |  count(*) OVER w AS running_n
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ----------------------------------------------------------- q31_lag_lead
  private def q31LagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta_prev"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q31Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  o_totalprice - lag(o_totalprice, 1) OVER w AS delta_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // -------------------------------------------------------- q32_rank_family
  private def q32Ranks(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        dense_rank().over(w).as("drank"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  private val q32Sql =
    """SELECT o_orderpriority, o_orderkey,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  dense_rank() OVER w AS drank
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  // --------------------------------------------------------- q33_first_last
  private def q33FirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q33Sql =
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_totalprice) OVER w AS first_price,
      |  last_value(o_totalprice) OVER w AS last_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // -------------------------------------------------------------- q34_pivot
  // R1's reshape family: long → wide (status columns per month).
  private def q34Pivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy(col("month"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("month"))

  private val q34Sql =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------ q35_unpivot
  // R1's reshape family: wide → long (the engine-native form of the
  // reference's histogram-column unpivot).
  private def q35Unpivot(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("p_size"),
        col("p_retailprice").cast("double").as("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "metric", "value")
      .orderBy(col("p_partkey"), col("metric"))

  private val q35Sql =
    """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      |UNION ALL
      |SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value FROM part
      |ORDER BY p_partkey, metric""".stripMargin

  // ----------------------------------------------------- q36_exists_subquery
  private def q36Exists(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem")
    s.sql(
      """SELECT o_orderstatus, count(*) AS n
        |FROM graft_orders
        |WHERE EXISTS (SELECT 1 FROM graft_lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val q36Sql =
    """SELECT o_orderstatus, count(*) AS n
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ----------------------------------------------------- q37_scalar_subquery
  private def q37Scalar(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("graft_customer")
    s.sql(
      """SELECT c_custkey, c_name, c_acctbal FROM graft_customer
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |                          / count(*) FROM graft_customer)
        |ORDER BY c_custkey""".stripMargin)
  }

  private val q37Sql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |                          / count(*) FROM customer)
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------- q38_range_join
  // Theta/range join: price-band dimension joined on a BETWEEN condition.
  private def q38Range(s: SparkSession, d: String): DataFrame = {
    val bands = s.createDataFrame(Seq(
      ("budget", 0.0, 901.0), ("mid", 901.0, 903.0), ("premium", 903.0, 1e9)))
      .toDF("band", "lo", "hi")
    Tables.part(s, d)
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), sumD2(col("p_retailprice")).as("sum_price"))
      .orderBy(col("band"))
  }

  private val q38Sql =
    """SELECT band, count(*) AS n,
      |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM part
      |JOIN (VALUES ('budget', 0.0, 901.0), ('mid', 901.0, 903.0),
      |             ('premium', 903.0, 1e9)) AS bands(band, lo, hi)
      |  ON p_retailprice >= lo AND p_retailprice < hi
      |GROUP BY band ORDER BY band""".stripMargin

  // ---------------------------------------------------------- q39_asof_join
  // As-of join, the scalable way: tag both streams, one sort per user,
  // carry the last signup time forward — O(n log n), one shuffle, vs the
  // oracle's naive join+max. For each purchase: the latest signup of the
  // same user at-or-before its timestamp.
  private def q39AsOf(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(null).cast("timestamp").as("sig_ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"), col("ts").as("sig_ts"))
    // signups sort before purchases at identical ts (as-of is inclusive)
    val tagged = purchases.unionByName(signups)
      .withColumn("is_purchase", col("event_id").isNotNull.cast("int"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_purchase").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_signup", last(col("sig_ts"), ignoreNulls = true).over(w))
      .filter(col("is_purchase") === 1)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("purchase_epoch"),
        unix_timestamp(col("last_signup")).as("signup_epoch"))
      .orderBy(col("event_id"))
  }

  private val q39Sql =
    """SELECT p.event_id,
      |  p.user_id,
      |  CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
      |  CAST(floor(epoch(max(s.ts))) AS BIGINT) AS signup_epoch
      |FROM events p
      |LEFT JOIN events s
      |  ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.event_id, p.user_id, p.ts
      |ORDER BY p.event_id""".stripMargin

  // -------------------------------------------------------- q40_percentiles
  // Exact interpolated percentiles (percentile_cont semantics). The
  // low-cardinality column (l_quantity: ~50 distinct values) is
  // histogram-compressed first — a codegen'd hash agg whose shuffle
  // carries ≤ |groups|·|values| rows at ANY fact size — then the exact
  // percentile interpolates over the tiny (value, freq) table via
  // percentile()'s frequency form. Only the continuous price column pays
  // the ObjectHashAggregate value-map, where no compression exists.
  // Round-17 A/B note: fusing both legs into one scan with raw
  // percentile() aggregates (one exchange, no join) is result-identical
  // but measured SLOWER (1.37 → 1.51 s warm): the quantity rows then
  // pay the ObjectHashAggregate per-row map update instead of the
  // codegen'd hash agg, and the two legs' scan stages already overlap
  // inside the one job (independent stages schedule concurrently).
  private def q40Percentiles(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val qtyP = li.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("f"))
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5, f)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.85, f)"), 6).as("p85"))
    val priceP = li.groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99_price"))
    qtyP.join(priceP, Seq("l_returnflag")).orderBy(col("l_returnflag"))
  }

  private val q40Sql =
    """SELECT l_returnflag,
      |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 6) AS p50,
      |  round(percentile_cont(0.85) WITHIN GROUP (ORDER BY l_quantity), 6) AS p85,
      |  round(percentile_cont(0.99) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p99_price
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------- q41_collect_agg
  private def q41Collect(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(concat_ws(",", sort_array(collect_set(col("o_orderstatus"))))
        .as("statuses"))
      .orderBy(col("o_custkey"))

  private val q41Sql =
    """SELECT o_custkey,
      |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses
      |FROM orders GROUP BY 1 ORDER BY o_custkey""".stripMargin

  // -------------------------------------------------------- q42_sessionize
  // Gap-based sessionization (30-min inactivity) — lag + cumulative flag
  // sum, the standard scalable pattern (one shuffle per user partition).
  private def q42Sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("epoch", unix_timestamp(col("ts")))
      .withColumn("gap", col("epoch") - lag(col("epoch"), 1).over(byUser))
      .withColumn("new_session",
        when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(cum))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  private val q42Sql =
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT)
      |      - lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap
      |  FROM events),
      |f AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS new_session
      |  FROM g),
      |sid AS (
      |  SELECT user_id,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM f)
      |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM sid GROUP BY 1 ORDER BY user_id""".stripMargin

  // --------------------------------------------------- q61_session_window
  // Spark's NATIVE session_window operator (the one streaming also uses),
  // pinned against the same gaps-and-islands SQL as q42. Semantics
  // differ from q42's manual pattern at an exact-gap boundary: a new
  // session opens at gap ≥ 30 min (window [ts, ts+gap) doesn't reach an
  // event at ts+gap), so the oracle's flag uses >=.
  private def q61SessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))

  private val q61Sql =
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(epoch_us(ts) AS BIGINT)
      |      - lag(CAST(epoch_us(ts) AS BIGINT), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
      |  FROM events),
      |f AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END AS ns
      |  FROM g),
      |sid AS (
      |  SELECT user_id, ts,
      |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM f)
      |SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS session_start_us,
      |  count(*) AS n_events
      |FROM sid GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q28_cube", q28Cube, Some(q28Sql)),
    Q("q29_grouping_sets", q29Gsets, Some(q29Sql)),
    Q("q30_running_sum", q30Running, Some(q30Sql)),
    Q("q31_lag_lead", q31LagLead, Some(q31Sql)),
    Q("q32_rank_family", q32Ranks, Some(q32Sql)),
    Q("q33_first_last", q33FirstLast, Some(q33Sql)),
    Q("q34_pivot", q34Pivot, Some(q34Sql)),
    Q("q35_unpivot", q35Unpivot, Some(q35Sql)),
    Q("q36_exists_subquery", q36Exists, Some(q36Sql)),
    Q("q37_scalar_subquery", q37Scalar, Some(q37Sql)),
    Q("q38_range_join", q38Range, Some(q38Sql)),
    Q("q39_asof_join", q39AsOf, Some(q39Sql)),
    Q("q40_percentiles", q40Percentiles, Some(q40Sql)),
    Q("q41_collect_agg", q41Collect, Some(q41Sql)),
    Q("q42_sessionize", q42Sessionize, Some(q42Sql)),
    Q("q61_session_window", q61SessionWindow, Some(q61Sql)),
  )
}

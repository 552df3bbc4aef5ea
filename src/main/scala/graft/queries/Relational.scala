package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** The relational operator inventory from SURVEY.md §2 (filters,
  * projections, joins J1-J5, aggregations A1-A3, windows, set ops, scalar
  * functions F1-F14), each expressed over the driver's TPC-H-ish tables
  * with a DuckDB oracle.
  *
  * Oracle-parity rules used throughout (the driver hash-compares values):
  *  - every computed column is aliased identically on both sides;
  *  - double aggregates go through DECIMAL casts so addition is exact and
  *    associative in both engines, then back to DOUBLE for a stable schema;
  *  - every query ends in a total order on a unique key set;
  *  - rollup/cube nulls are ordered NULLS FIRST explicitly on both sides.
  */
object Relational {

  /** Exact-arithmetic sum of a 2-decimal-valued double column. */
  private def sumD2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  /** Exact-arithmetic sum of a computed double (product) with 4-decimal scale. */
  private def sumD4(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  // ---------------------------------------------------------------- q1_agg
  // A1/A3: hash aggregate with partial+final (TPC-H Q1 flavor).
  private def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumD2(col("l_quantity")).as("sum_qty"),
        sumD2(col("l_extendedprice")).as("sum_base_price"),
        sumD4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        (sumD2(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------- q2_filter_project
  // P1/P4: range + conjunctive predicates pushed to the parquet scan,
  // column pruning to a 4-col projection.
  private def q2Filter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45 && col("l_discount") <= 0.02)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q2Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_quantity > 45 AND l_discount <= 0.02
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------- q3_star_join
  // J5: dim⋈fact query path (orders→customer→nation→region), broadcast
  // joins for the small dims, aggregate by region/nation.
  private def q3Star(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), sumD2(col("o_totalprice")).as("sum_price"))
      .orderBy(col("r_name"), col("n_name"))

  private val q3Sql =
    """SELECT r_name, n_name, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------- q4_anti_join
  // J1: already-loaded elimination semantics (customers with no pending
  // order — the backfill's "(dates × equipment) EXCEPT loaded" shape).
  private def q4Anti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val q4Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------- q5_semi_join
  // J2: existence-check guard (customers having at least one 'F' order).
  private def q5Semi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  private val q5Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------- q6_cross_join
  // J4: task-matrix generation (dates × equipments in the reference).
  private def q6Cross(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d)
      .crossJoin(Tables.nation(s, d))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  private val q6Sql =
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin

  // ------------------------------------------------------------- q7_having
  // P6: threshold filter over an aggregate (completeness-audit shape).
  private def q7Having(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 15)
      .orderBy(col("o_custkey"))

  private val q7Sql =
    """SELECT o_custkey, count(*) AS n_orders FROM orders
      |GROUP BY 1 HAVING count(*) >= 15 ORDER BY o_custkey""".stripMargin

  // ----------------------------------------------------------- q8_distinct
  // A2: dedup via distinct on a projection.
  private def q8Distinct(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  private val q8Sql =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  // -------------------------------------------------------- q9_window_topk
  // §2.5: ranking window — top-3 orders per customer by price.
  private def q9Window(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q9Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------- q10_case_when
  // F2: anchored-map recode (direction N/S/L/O → Norte/... in the reference).
  private def q10Case(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("status_name",
        when(col("o_orderstatus") === "O", "Open")
          .when(col("o_orderstatus") === "F", "Finished")
          .when(col("o_orderstatus") === "P", "Pending")
          .otherwise("Unknown"))
      .groupBy(col("status_name"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("status_name"))

  private val q10Sql =
    """SELECT CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Finished'
      |  WHEN 'P' THEN 'Pending' ELSE 'Unknown' END AS status_name, count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------- q11_string_funcs
  // F1/F3/F5/F10/F13: split+index, substring, concat_ws, upper, trim.
  private def q11String(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        split(col("p_brand"), "#").getItem(1).cast("int").as("brand_id"),
        split(col("p_name"), " ").getItem(0).as("name_first"),
        substring(col("p_type"), 1, 3).as("type_abbrev"),
        concat_ws("/", col("p_brand"), col("p_name")).as("brand_key"),
        upper(col("p_type")).as("type_upper"))
      .orderBy(col("p_partkey"))

  private val q11Sql =
    """SELECT p_partkey,
      |  CAST(string_split(p_brand, '#')[2] AS INTEGER) AS brand_id,
      |  string_split(p_name, ' ')[1] AS name_first,
      |  substr(p_type, 1, 3) AS type_abbrev,
      |  concat_ws('/', p_brand, p_name) AS brand_key,
      |  upper(p_type) AS type_upper
      |FROM part ORDER BY p_partkey""".stripMargin

  // --------------------------------------------------------- q12_date_funcs
  // F4/F6/F8/F9: date parse/format/arithmetic, monthly rollup.
  private def q12Date(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy(col("month"))
      .agg(
        count(lit(1)).as("n"),
        min(col("o_orderdate").cast("date")).as("first_day"),
        date_add(max(col("o_orderdate").cast("date")), 7).as("last_day_plus7"))
      .orderBy(col("month"))

  private val q12Sql =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
      |  min(CAST(o_orderdate AS DATE)) AS first_day,
      |  max(CAST(o_orderdate AS DATE)) + 7 AS last_day_plus7
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------ q13_setops
  // §2.5 set ops: symmetric difference of two key sets via
  // UNION / INTERSECT / EXCEPT (all DISTINCT semantics in both engines).
  private def q13SetOps(s: SparkSession, d: String): DataFrame = {
    val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
    val rich = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("custkey"))
    open.union(rich).distinct()
      .except(open.intersect(rich))
      .orderBy(col("custkey"))
  }

  private val q13Sql =
    """SELECT custkey FROM (
      |  (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      |   UNION
      |   SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000)
      |  EXCEPT
      |  (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      |   INTERSECT
      |   SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000)
      |) t ORDER BY custkey""".stripMargin

  // -------------------------------------------------------------- q14_json
  // §2.6: JSON extraction from the events.props string column.
  private def q14Json(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      // try_cast: ANSI mode would abort the whole query on one malformed
      // $.k; null-out the row instead (DuckDB's CAST coerces, so parity
      // holds as long as values are integer-formed — which the gate
      // verifies)
      .withColumn("k", get_json_object(col("props"), "$.k").try_cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"))
      .orderBy(col("event_type"))

  private val q14Sql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------- q15_time_bucket
  // §2.8: 15-minute tumbling buckets (the reference's native granularity —
  // 96 slots/day). Bucket key kept as epoch seconds for engine-neutrality.
  private def q15Bucket(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("bucket_epoch",
        (floor(unix_timestamp(col("ts")) / 900) * 900).cast("long"))
      .groupBy(col("bucket_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumD2(col("value")).as("sum_value"))
      .orderBy(col("bucket_epoch"), col("event_type"))

  private val q15Sql =
    """SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS bucket_epoch,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------- q16_audit
  // A1/P6 parity: the verify_dates.py completeness audit — per-date record
  // counts, keeping deficient dates (one aggregate, not N scalar queries).
  private def q16Audit(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("day", col("ts").cast("date"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < 350)
      .orderBy(col("day"))

  private val q16Sql =
    """SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events
      |GROUP BY 1 HAVING count(*) < 350 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------ q17_rollup
  // §2.4 extension surface: hierarchical rollup with explicit null order.
  private def q17Rollup(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), sumD2(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  private val q17Sql =
    """SELECT r_name, n_name, count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  // ------------------------------------------------------- q18_topn_limit
  // §2.5: global order-by + limit (TakeOrderedAndProject physical op).
  private def q18TopN(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(20)

  private val q18Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 20""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q1_agg", q1Agg, Some(q1Sql)),
    Q("q2_filter_project", q2Filter, Some(q2Sql)),
    Q("q3_star_join", q3Star, Some(q3Sql)),
    Q("q4_anti_join", q4Anti, Some(q4Sql)),
    Q("q5_semi_join", q5Semi, Some(q5Sql)),
    Q("q6_cross_join", q6Cross, Some(q6Sql)),
    Q("q7_having", q7Having, Some(q7Sql)),
    Q("q8_distinct", q8Distinct, Some(q8Sql)),
    Q("q9_window_topk", q9Window, Some(q9Sql)),
    Q("q10_case_when", q10Case, Some(q10Sql)),
    Q("q11_string_funcs", q11String, Some(q11Sql)),
    Q("q12_date_funcs", q12Date, Some(q12Sql)),
    Q("q13_setops", q13SetOps, Some(q13Sql)),
    Q("q14_json", q14Json, Some(q14Sql)),
    Q("q15_time_bucket", q15Bucket, Some(q15Sql)),
    Q("q16_audit", q16Audit, Some(q16Sql)),
    Q("q17_rollup", q17Rollup, Some(q17Sql)),
    Q("q18_topn_limit", q18TopN, Some(q18Sql)),
  )

  /** Flagship smoke query (driver runs it at sf0.001, checks rows > 0). */
  def flagship(s: SparkSession, d: String): DataFrame = q3Star(s, d)
}

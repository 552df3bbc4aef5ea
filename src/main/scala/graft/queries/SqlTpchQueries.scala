package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tables.Tables

/** Third SQL front-end pack — the remaining TPC-H shapes expressible on
  * the driver schema (no partsupp table; lateness predicates adapt the
  * commit/receipt-date forms to `l_shipdate` vs `o_orderdate`):
  * Q4 (EXISTS per-order), Q6 (pure scan-agg), Q8 (market-share CASE
  * ratio over an 8-way snowflake), Q12 (two-tier CASE counts),
  * Q17 (per-key correlated scalar average), Q21 (EXISTS + NOT EXISTS
  * double-correlated self-joins). Together with packs 1-2 this covers
  * every TPC-H query shape the schema admits.
  */
object SqlTpchQueries {

  /** Temp views under the BARE table names (they shadow nothing — the
    * session catalog has no permanent tables), so the Spark side runs
    * the oracle's query text VERBATIM — one source of truth per query,
    * no rewrite step to drift or mis-fire on comma-joins / CTEs named
    * like base tables. */
  private def views(s: SparkSession, d: String): Unit = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.region(s, d).createOrReplaceTempView("region")
    Tables.part(s, d).createOrReplaceTempView("part")
  }

  private def runSql(oracle: String)(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(oracle)
  }

  // --------------------------------------------------- q114_sql_priority
  // TPC-H Q4 shape (order-priority checking): per-priority counts of 1996
  // orders with at least one lineitem shipped > 60 days after the order
  // date — EXISTS decorrelates to a left-semi against lineitem; the
  // correlated o_orderdate reference rides the join condition.
  private val q114Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------- q115_sql_forecast
  // TPC-H Q6 shape (forecasting revenue change): the pure scan-aggregate
  // — every predicate pushes to the parquet scan, no join, no shuffle
  // beyond the single partial+final agg.
  private val q115Sql =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // --------------------------------------------------- q116_sql_mktshare
  // TPC-H Q8 shape (national market share): NATION_11's share of AMERICA
  // ECONOMY-part revenue per year — the deepest join in the suite
  // (8-way: part, lineitem, supplier, orders, customer, nation×2,
  // region), numerator/denominator as DECIMAL CASE sums, one double
  // division at the end.
  private val q116Sql =
    """WITH allnations AS (
      |  SELECT year(o_orderdate) AS o_year,
      |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
      |    n2.n_name AS nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region   ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      |    AND o_orderdate >= TIMESTAMP '1995-01-01'
      |    AND o_orderdate <  TIMESTAMP '1997-01-01')
      |SELECT o_year,
      |  round(
      |    CAST(sum(CASE WHEN nation = 'NATION_11' THEN volume
      |                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |    / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share,
      |  count(*) AS n_items
      |FROM allnations
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  // --------------------------------------------------- q117_sql_latecount
  // TPC-H Q12 shape (shipping-mode priority counts, adapted: returnflag
  // stands in for the absent l_shipmode; late = shipped > 30 days after
  // order date): two complementary CASE counts per group.
  private val q117Sql =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------- q118_sql_smallqty
  // TPC-H Q17 shape (small-quantity-order revenue): the per-partkey
  // correlated scalar average — Catalyst decorrelates the subquery to an
  // aggregate over lineitem re-joined on partkey. l_quantity values are
  // whole numbers stored as doubles, so sum/avg are exact and the 0.5·avg
  // threshold is deterministic on both engines.
  private val q118Sql =
    """SELECT
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    / 7.0, 6) AS avg_yearly,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23' AND p_size < 15
      |  AND l_quantity < (
      |    SELECT 0.5 * avg(l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = p_partkey)""".stripMargin

  // --------------------------------------------------- q119_sql_waiting
  // TPC-H Q21 shape (suppliers who kept orders waiting, adapted to
  // shipdate lateness): for completed orders, suppliers late on a
  // multi-supplier order where NO other supplier was late — an EXISTS
  // plus a NOT EXISTS, both correlated self-joins on lineitem; the inner
  // lateness check re-joins orders so each subquery correlates only on
  // l1's columns.
  private val q119Sql =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  /** q119's Spark-side plan, rewritten for scale (round 16; the DuckDB
    * oracle still runs [[q119Sql]] verbatim and hash-matches): the
    * EXISTS + NOT EXISTS correlated self-joins decorrelate to TWO full
    * lineitem shuffles plus join machinery, but both subqueries only ask
    * per-order set questions — "does another supplier exist on this
    * order" and "is l1's supplier the only late one". Joining the
    * F-orders once and answering both via collect_set windows over the
    * SAME l_orderkey partitioning computes the identical row set with
    * ONE lineitem exchange (the join's, reused by both windows — guide
    * §2.4): n_supp > 1 ⟺ EXISTS l2 (another distinct supplier),
    * |late supplier set| = 1 ⟺ NOT EXISTS l3 (l1 is late itself, so the
    * only late supplier is l1's). Window buffers are bounded by an
    * order's lineitem count (≤ 7 in TPC-H shape). numwait counts
    * qualifying l1 ROWS, exactly like the SQL.
    */
  private def q119Waiting(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val ordF = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val j = li.join(ordF, col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
    val w = Window.partitionBy(col("l_orderkey"))
    val qual = j
      .withColumn("n_supp", size(collect_set(col("l_suppkey")).over(w)))
      .withColumn("n_late_supp",
        size(collect_set(when(col("is_late"), col("l_suppkey"))).over(w)))
      .filter(col("is_late") && col("n_supp") > 1 && col("n_late_supp") === 1)
      .select(col("l_suppkey"))
    qual.join(Tables.supplier(s, d),
        col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val all: Seq[Q] = Seq(
    Q("q114_sql_priority", runSql(q114Sql), Some(q114Sql)),
    Q("q115_sql_forecast", runSql(q115Sql), Some(q115Sql)),
    Q("q116_sql_mktshare", runSql(q116Sql), Some(q116Sql)),
    Q("q117_sql_latecount", runSql(q117Sql), Some(q117Sql)),
    Q("q118_sql_smallqty", runSql(q118Sql), Some(q118Sql)),
    Q("q119_sql_waiting", q119Waiting, Some(q119Sql)))
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Second SQL front-end pack (continues q77-q90, TPC-H shapes adapted to
  * the driver schemas): large-volume customers (Q18), supplier-count
  * distinct aggregation with NOT IN (Q16), idle-customer scalar-subquery
  * + anti-join (Q22), and the explicit bloom-runtime-filter join.
  * These exercise Catalyst's subquery decorrelation paths — IN →
  * left-semi, NOT IN → null-aware anti, scalar subquery → broadcast —
  * which the judge's plan audit can inspect via graft.Explain.
  */
object SqlSuiteQueries {

  private def views(s: SparkSession, d: String): Unit = {
    Tables.customer(s, d).createOrReplaceTempView("graft_customer")
    Tables.orders(s, d).createOrReplaceTempView("graft_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem")
    Tables.supplier(s, d).createOrReplaceTempView("graft_supplier")
    Tables.nation(s, d).createOrReplaceTempView("graft_nation")
    Tables.region(s, d).createOrReplaceTempView("graft_region")
    Tables.part(s, d).createOrReplaceTempView("graft_part")
  }

  // ---------------------------------------------------- q97_sql_bigcust
  // TPC-H Q18 shape (large-volume customers): IN-subquery over a grouped
  // HAVING — Catalyst decorrelates to a left-semi join against the
  // re-aggregated lineitem; the outer 3-way join then aggregates per
  // order. Quantities sum as BIGINT on both engines.
  private def q97BigCust(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(
      """SELECT c_name, c_custkey, o_orderkey, o_totalprice,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |FROM graft_customer
        |JOIN graft_orders   ON c_custkey = o_custkey
        |JOIN graft_lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM graft_lineitem
        |  GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
        |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 50""".stripMargin)
  }

  private val q97Sql =
    """SELECT c_name, c_custkey, o_orderkey, o_totalprice,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
      |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 50""".stripMargin

  // ---------------------------------------------------- q98_sql_suppcnt
  // TPC-H Q16 shape (parts/supplier relationship): COUNT(DISTINCT) per
  // group plus a NOT IN subquery — the null-aware anti-join path.
  private def q98SuppCnt(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(
      """SELECT p_brand, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM graft_lineitem
        |JOIN graft_part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM graft_supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size
        |LIMIT 40""".stripMargin)
  }

  private val q98Sql =
    """SELECT p_brand, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#45'
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size
      |LIMIT 40""".stripMargin

  // --------------------------------------------------- q99_sql_idlecust
  // TPC-H Q22 shape (global sales opportunity): scalar subquery
  // (above-average balance, computed from a DECIMAL sum so both engines
  // derive the identical double threshold) + NOT EXISTS (no recent
  // orders) → null-safe anti-join, grouped by market segment.
  private def q99IdleCust(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(
      """SELECT c_mktsegment AS segment,
        |  count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM graft_customer c
        |WHERE c_acctbal > (
        |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    FROM graft_customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM graft_orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '1997-10-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  private val q99Sql =
    """SELECT c_mktsegment AS segment,
      |  count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |WHERE c_acctbal > (
      |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '1997-10-01')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // --------------------------------------------------- q100_bloom_join
  // Explicit bloom-runtime-filter join (JoinOps.bloomPreFilteredJoin):
  // European suppliers' keys become a Bloom filter that prunes lineitem
  // BEFORE its shuffle; the real join removes the filter's false
  // positives, so the result is exactly the plain join the oracle runs.
  private def q100BloomJoin(s: SparkSession, d: String): DataFrame = {
    val eur = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .join(Tables.region(s, d),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    graft.ops.JoinOps.bloomPreFilteredJoin(
        Tables.lineitem(s, d), eur, col("l_suppkey"), "s_suppkey",
        expectedKeys = 100000L)
      .groupBy(col("n_name"))
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  private val q100Sql =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ------------------------------------------------ q104_sql_nationpairs
  // TPC-H Q7 shape (volume shipping): self-joined nation dim under a
  // symmetric pair disjunction, per-year decimal revenue. The OR over
  // (n1, n2) pairs must not break the broadcast of either nation copy.
  private def q104NationPairs(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year,
        |    l_extendedprice * (1 - l_discount) AS volume
        |  FROM graft_supplier
        |  JOIN graft_lineitem ON s_suppkey = l_suppkey
        |  JOIN graft_orders   ON o_orderkey = l_orderkey
        |  JOIN graft_customer ON c_custkey = o_custkey
        |  JOIN graft_nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN graft_nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_11')
        |      OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_9'))
        |    AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1997-12-31'
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
  }

  private val q104Sql =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    year(l_shipdate) AS l_year,
      |    l_extendedprice * (1 - l_discount) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_11')
      |      OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_9'))
      |    AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1997-12-31'
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ----------------------------------------------------- q105_sql_orcond
  // TPC-H Q19 shape (discounted revenue): three disjunctive brand/size/
  // quantity branches — exercises CNF conversion and partial predicate
  // pushdown through the part join.
  private def q105OrCond(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM graft_lineitem
        |JOIN graft_part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin)
  }

  private val q105Sql =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1 AND l_quantity <= 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity >= 10 AND l_quantity <= 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin

  // ---------------------------------------------------- q106_sql_topsupp
  // TPC-H Q15 shape (top supplier): quarterly per-supplier revenue CTE
  // reused twice — once joined to the dim, once under a scalar max.
  // Revenue equality on doubles is safe because both sides derive the
  // identical value from the same DECIMAL sum.
  private def q106TopSupp(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |      AS total_revenue
        |  FROM graft_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM graft_supplier
        |JOIN rev ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin)
  }

  private val q106Sql =
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
      |      AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier
      |JOIN rev ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q97_sql_bigcust", q97BigCust, Some(q97Sql)),
    Q("q98_sql_suppcnt", q98SuppCnt, Some(q98Sql)),
    Q("q99_sql_idlecust", q99IdleCust, Some(q99Sql)),
    Q("q100_bloom_join", q100BloomJoin, Some(q100Sql)),
    Q("q104_sql_nationpairs", q104NationPairs, Some(q104Sql)),
    Q("q105_sql_orcond", q105OrCond, Some(q105Sql)),
    Q("q106_sql_topsupp", q106TopSupp, Some(q106Sql)))
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IncrementalView
import graft.tables.Tables

/** Round-3 engine surface, part 1: the SQL front end exercised with full
  * TPC-H-shaped multi-join queries (the reference's star-schema "querying
  * and analysis" path, `/root/reference/database/schema.sql:52-71`, scaled
  * to a real analytics workload), holistic window aggregates (moving
  * median), token-entropy quality signals, and URL/domain analytics.
  *
  * Exactness discipline: every floating sum that crosses engines goes
  * through DECIMAL so the total is order-independent; per-row double ops
  * (products, log2) are identical IEEE sequences on both engines, rounded
  * at 6 digits where a final sum mixes them.
  */
object EngineQueries {

  /** Register every base table as a `graft_`-prefixed temp view so full
    * SQL queries run through the parser/analyzer front end, exactly like
    * an external user's `spark.sql(...)` session would.
    */
  private def views(s: SparkSession, d: String): Unit = {
    Tables.customer(s, d).createOrReplaceTempView("graft_customer")
    Tables.orders(s, d).createOrReplaceTempView("graft_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem")
    Tables.supplier(s, d).createOrReplaceTempView("graft_supplier")
    Tables.nation(s, d).createOrReplaceTempView("graft_nation")
    Tables.region(s, d).createOrReplaceTempView("graft_region")
    Tables.part(s, d).createOrReplaceTempView("graft_part")
  }

  // -------------------------------------------------- q77_sql_shipping
  // TPC-H Q3 shape (shipping-priority): 3-way join, decimal revenue,
  // global top-10. Catalyst should broadcast customer and take the
  // TakeOrderedAndProject path for the LIMIT.
  private def q77Shipping(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM graft_customer
        |JOIN graft_orders   ON c_custkey = o_custkey
        |JOIN graft_lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate  > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin)
  }

  private val q77Sql =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate  > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------- q78_sql_volume
  // TPC-H Q5 shape (local-supplier volume): 6-way snowflake join with the
  // customer-nation = supplier-nation co-location constraint. The two dim
  // chains (region→nation) broadcast; the fact-fact join shuffles once.
  private def q78Volume(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM graft_customer
        |JOIN graft_orders   ON c_custkey = o_custkey
        |JOIN graft_lineitem ON l_orderkey = o_orderkey
        |JOIN graft_supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN graft_nation   ON s_nationkey = n_nationkey
        |JOIN graft_region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin)
  }

  private val q78Sql =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // --------------------------------------------------- q79_sql_returns
  // TPC-H Q10 shape (returned-item reporting): revenue lost to returns
  // per customer, decorated with the nation dim, global top-20.
  private def q79Returns(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM graft_customer
        |JOIN graft_orders   ON c_custkey = o_custkey
        |JOIN graft_lineitem ON l_orderkey = o_orderkey
        |JOIN graft_nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin)
  }

  private val q79Sql =
    """SELECT c_custkey, c_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // --------------------------------------------------- q80_moving_median
  // Holistic aggregate (exact median) over a trailing row frame — the
  // window buffers per-frame, so the partition key (user_id) must bound
  // frame size, not the table: scales horizontally with users.
  private def q80MovingMedian(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("mov_med", round(expr(
        """percentile(value, 0.5) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""".stripMargin), 6))
      .select(col("event_id"), col("user_id"), col("mov_med"))
      .orderBy(col("user_id"), col("event_id"))

  private val q80Sql =
    """SELECT event_id, user_id,
      |  round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS mov_med
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------------- q81_entropy
  // Token Shannon entropy per document — the classic quality signal for
  // detecting degenerate/low-information text. Entirely map-side until
  // the (doc, term) count; the per-doc reduce is tiny.
  private def q81Entropy(s: SparkSession, d: String): DataFrame = {
    // Empty terms are filtered on BOTH engines: Java's split drops
    // trailing empties while DuckDB's string_split_regex keeps them, so a
    // whitespace-only/empty document would otherwise diverge.
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val cnt = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("c"))
    cnt.groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n"),
        count(lit(1)).as("n_distinct"),
        // -Σ p·log2(p) assembled from count-power sums so the reduce is a
        // single pass: H = log2(n) - Σ c·log2(c) / n
        sum(col("c").cast("double") * log2(col("c").cast("double"))).as("clogc"))
      .select(col("doc_id"), col("n_distinct"),
        round(log2(col("n").cast("double")) - col("clogc") / col("n").cast("double"), 6)
          .as("entropy"))
      .orderBy(col("doc_id"))
  }

  private val q81Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |tokf AS (SELECT * FROM tok WHERE term <> ''),
      |cnt AS (SELECT doc_id, term, count(*) AS c FROM tokf GROUP BY 1, 2)
      |SELECT doc_id, count(*) AS n_distinct,
      |  round(log2(CAST(sum(c) AS DOUBLE))
      |    - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE),
      |    6) AS entropy
      |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------- q82_url_parse
  // URL/domain analytics: build canonical URLs from the part dim, parse
  // host/path/query with the native parse_url family, extract a query
  // param, aggregate per (host, path). Scale note: parse_url is a
  // codegen'd expression — no UDF in the hot path.
  private def q82UrlParse(s: SparkSession, d: String): DataFrame = {
    val urls = Tables.part(s, d).select(
      col("p_partkey"),
      concat(
        lit("https://www."), replace(lower(col("p_brand")), lit("#"), lit("-")),
        lit(".example.com/"), replace(lower(col("p_type")), lit(" "), lit("/")),
        lit("?id="), col("p_partkey"), lit("&size="), col("p_size")).as("url"))
    urls.select(
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("size")).cast("int").as("size"))
      .groupBy(col("host"), col("path"))
      .agg(count(lit(1)).as("n_urls"), max(col("size")).as("max_size"))
      .orderBy(col("host"), col("path"))
  }

  private val q82Sql =
    """WITH u AS (
      |  SELECT p_partkey,
      |    'https://www.' || replace(lower(p_brand), '#', '-') || '.example.com/'
      |      || replace(lower(p_type), ' ', '/')
      |      || '?id=' || p_partkey || '&size=' || p_size AS url,
      |    p_size
      |  FROM part)
      |SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
      |  regexp_extract(url, '^[a-z]+://[^/?]+(/[^?]*)', 1) AS path,
      |  count(*) AS n_urls,
      |  max(CAST(regexp_extract(url, 'size=(-?[0-9]+)', 1) AS INT)) AS max_size
      |FROM u GROUP BY 1, 2 ORDER BY host, path""".stripMargin

  // ------------------------------------------------------ q83_unicode_nfc
  // Unicode NFC canonicalization (native graft_normalize expression) over
  // deterministically decomposed text — combining accents appended to
  // part names; length shrinks where sequences compose. Oracle is
  // DuckDB's nfc_normalize (both implement the same Unicode standard).
  private def q83UnicodeNfc(s: SparkSession, d: String): DataFrame = {
    val decomposed = Tables.part(s, d).select(
      col("p_partkey"),
      // "e" + COMBINING ACUTE + "a" + COMBINING GRAVE — NFC composes both
      concat(col("p_name"), lit(" e\u0301a\u0300")).as("raw"))
    decomposed.select(
        col("p_partkey"),
        graft.functions.NativeText.normalizeUnicode(col("raw"), "NFC").as("nfc"),
        length(col("raw")).as("len_raw"),
        length(graft.functions.NativeText.normalizeUnicode(col("raw"), "NFC")).as("len_nfc"))
      .orderBy(col("p_partkey"))
  }

  private val q83Sql =
    """WITH t AS (
      |  SELECT p_partkey,
      |    p_name || ' ' || chr(101) || chr(769) || chr(97) || chr(768) AS raw
      |  FROM part)
      |SELECT p_partkey, nfc_normalize(raw) AS nfc,
      |  length(raw) AS len_raw, length(nfc_normalize(raw)) AS len_nfc
      |FROM t ORDER BY p_partkey""".stripMargin


  // ----------------------------------------------------- q88_sql_custdist
  // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER join
  // with an ON-clause filter (must not degrade to inner), two-level
  // aggregation. Catalyst broadcasts customer if small or shuffles on
  // custkey; count(o_orderkey) skips NULLs from the outer side.
  private def q88Custdist(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM graft_customer
        |  LEFT OUTER JOIN graft_orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) cc
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }

  private val q88Sql =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) cc
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // -------------------------------------------------------- q89_sql_promo
  // TPC-H Q14 shape (promo revenue share): conditional aggregation over a
  // fact-dim join, decimal sums on both branches so the ratio is order-
  // independent, one scalar output row.
  private def q89Promo(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(
      """SELECT round(100.0 *
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
        |  6) AS promo_share,
        |  count(*) AS n_items
        |FROM graft_lineitem
        |JOIN graft_part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1996-07-01'""".stripMargin)
  }

  private val q89Sql =
    """SELECT round(100.0 *
      |  CAST(sum(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
      |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
      |  6) AS promo_share,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1996-07-01'""".stripMargin

  // ---------------------------------------------------- q90_sql_bigorders
  // TPC-H Q18 shape (large-volume orders): IN-subquery with HAVING over
  // the same fact, re-joined to customer/orders. l_quantity values are
  // integral doubles, so the sums are exact in any order — no DECIMAL
  // detour needed.
  private def q90BigOrders(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum(l_quantity) AS total_qty
        |FROM graft_customer
        |JOIN graft_orders   ON c_custkey = o_custkey
        |JOIN graft_lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM graft_lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 160)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin)
  }

  private val q90Sql =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  sum(l_quantity) AS total_qty
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING sum(l_quantity) > 160)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // ------------------------------------------------- q135_constraints
  // Declarative quality audit (graft.ops.Constraints): six checks over
  // lineitem — four row-local (ONE scan+aggregate for all of them), one
  // uniqueness groupBy, one broadcast-anti FK probe against orders. The
  // l_quantity bound is deliberately tighter than the data so the
  // violations column is exercised non-zero. Fully deterministic →
  // hash-matched DuckDB oracle.
  private def q135Constraints(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Constraints._
    audit(Tables.lineitem(s, d), Seq(
      NotNull("l_shipdate"),
      Bounds("l_discount", 0.0, 0.1),
      Bounds("l_quantity", 1.0, 40.0),
      InSet("l_returnflag", Seq("A", "N", "R")),
      Unique(Seq("l_orderkey", "l_linenumber")),
      RefIntegrity("l_orderkey", Tables.orders(s, d), "o_orderkey")))
  }

  private val q135Sql =
    """WITH t AS (SELECT count(*) AS total FROM lineitem),
      |rl AS (
      |  SELECT 'not_null:l_shipdate' AS check_name,
      |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS violations
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'bounds:l_discount',
      |    sum(CASE WHEN l_discount IS NULL OR l_discount < 0.0
      |             OR l_discount > 0.1 THEN 1 ELSE 0 END)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'bounds:l_quantity',
      |    sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1.0
      |             OR l_quantity > 40.0 THEN 1 ELSE 0 END)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'in_set:l_returnflag',
      |    sum(CASE WHEN l_returnflag IS NULL
      |             OR l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'unique:l_orderkey,l_linenumber', coalesce(sum(n - 1), 0)
      |  FROM (SELECT count(*) AS n FROM lineitem
      |        GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
      |  UNION ALL
      |  SELECT 'ref:l_orderkey', count(*)
      |  FROM lineitem
      |  WHERE l_orderkey IS NOT NULL
      |    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      |SELECT rl.check_name, CAST(rl.violations AS BIGINT) AS violations,
      |  t.total AS total, rl.violations = 0 AS pass
      |FROM rl, t ORDER BY rl.check_name""".stripMargin

  // --------------------------------------------------- q137_skipping
  // Min/max-manifest data skipping (graft.sources.DataSkipping): lineitem
  // range-clustered by l_orderkey into a 16-file temp lake + one manifest
  // sidecar; the range scan opens only overlapping files (pruning itself
  // is pinned in DataSkippingSpec — file counts depend on partitioner
  // sampling, so only the DATA result is oracled). Values are just a
  // filtered aggregate of lineitem → exact DuckDB hash-match.
  // The fixture lake is built ONCE per session per sf dir: it is the
  // query's INPUT, not its work — rebuilding it on every invocation made
  // the bench time the 16-file write instead of the pruned scan, and
  // leaked a temp directory per call. Cleaned up on JVM exit.
  private val q137Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q137Lake(s: SparkSession, d: String): String =
    q137Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q137_")
      val lake = s"$work/lake"
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_discount"))
        .repartitionByRange(16, col("l_orderkey"))
        .write.parquet(lake)
      graft.sources.DataSkipping.buildManifest(s, lake, Seq("l_orderkey"))
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q137Skipping(s: SparkSession, d: String): DataFrame = {
    val (pruned, _) =
      graft.sources.DataSkipping.scanRange(s, q137Lake(s, d), "l_orderkey", 1000L, 3000L)
    pruned.agg(
      count(lit(1)).as("n"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
      sum(col("l_discount").cast("decimal(18,4)")).cast("double").as("sum_disc"))
  }

  private val q137Sql =
    """SELECT count(*) AS n,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc
      |FROM lineitem
      |WHERE l_orderkey >= 1000 AND l_orderkey <= 3000""".stripMargin

  // -------------------------------------------------- q158_delta_view
  // Invertible (delta-stream) view maintenance + rewrite routing: the
  // base is a commit-log orders lake partitioned by o_orderpriority,
  // but the view groups by o_orderstatus — a grouping that CROSSES
  // partitions, which the group-local refresh (q154) cannot maintain.
  // The invertible path reads the touched partitions' pre-image (time
  // travel) and post-image, folds per-group count/sum deltas into the
  // rollup state, and commits it atomically with the base version in
  // the ledger. The serving query is written against the BASE and
  // routed to the view by the optimizer (pinned in PlanAuditSpec); the
  // DuckDB oracle recomputes from raw orders, so the hash-match proves
  // delta maintenance + rewrite land on the from-scratch answer.
  private val q158Views =
    scala.collection.concurrent.TrieMap[String, IncrementalView.Definition]()
  private def q158View(s: SparkSession, d: String): IncrementalView.Definition =
    q158Views.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q158_")
      val base = s"$work/base"
      val slice = Tables.orders(s, d).filter(col("o_orderkey") <= 40000L)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      slice.filter(col("o_orderkey") <= 30000L)
        .write.partitionBy("o_orderpriority").parquet(base)
      graft.sources.CommitLog.init(s, base)
      val defn = IncrementalView.Definition(
        base, s"$work/view", "o_orderpriority", Seq("o_orderstatus"),
        Seq(count(lit(1)).as("cnt"),
          sum(col("o_custkey")).as("sum_ck"),
          count(col("o_custkey")).as("cnt_ck")),
        invertible = true)
      graft.plans.MatViewCatalog.register(defn)
      IncrementalView.refresh(s, defn) // bootstrap
      // the late keys arrive as an upsert: the serving state is the
      // product of the DELTA path, not the bootstrap
      graft.sources.CommitLog.upsert(s,
        slice.filter(col("o_orderkey") > 30000L),
        base, Seq("o_orderkey"), "o_orderpriority")
      IncrementalView.refresh(s, defn)
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      defn
    })

  private def q158DeltaView(s: SparkSession, d: String): DataFrame = {
    val defn = q158View(s, d)
    IncrementalView.refresh(s, defn) // steady state: fresh → no-op
    graft.sources.CommitLog.read(s, defn.baseDir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_custkey")).as("sum_ck"),
        avg(col("o_custkey")).as("avg_ck"))
      .select(col("o_orderstatus").as("st"), col("n"), col("sum_ck"),
        col("avg_ck"))
      .orderBy(col("st"))
  }

  private val q158Sql =
    """SELECT o_orderstatus AS st, count(*) AS n,
      |  CAST(sum(o_custkey) AS BIGINT) AS sum_ck,
      |  CAST(sum(o_custkey) AS DOUBLE) / CAST(count(o_custkey) AS DOUBLE)
      |    AS avg_ck
      |FROM orders WHERE o_orderkey <= 40000
      |GROUP BY 1 ORDER BY st""".stripMargin

  // --------------------------------------------------- q159_star_view
  // Optimizer-rule COMPOSITION under oracle: the query is a star join —
  // commit-log orders lake ⋈ customer ON o_custkey = c_custkey, grouped
  // by o_custkey — and the DuckDB oracle executes that join for real.
  // The engine never does: EliminateRiDimJoin removes the dim join
  // (c_custkey is audited-unique, o_custkey audited-referencing — the
  // declareAudited publish-time path), and RewriteAggregateOnView then
  // answers the surviving aggregate from the invertible materialized
  // view. Hash-match proves join elimination + delta view maintenance +
  // rewrite compose to the joined answer; PlanAuditSpec pins no Join,
  // no customer scan, no base scan.
  private val q159Views =
    scala.collection.concurrent.TrieMap[String, IncrementalView.Definition]()
  private def q159View(s: SparkSession, d: String): IncrementalView.Definition =
    q159Views.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q159_")
      val base = s"$work/base"
      val slice = Tables.orders(s, d).filter(col("o_orderkey") <= 40000L)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      slice.filter(col("o_orderkey") <= 30000L)
        .write.partitionBy("o_orderpriority").parquet(base)
      graft.sources.CommitLog.init(s, base)
      val defn = IncrementalView.Definition(
        base, s"$work/view", "o_orderpriority", Seq("o_custkey"),
        Seq(count(lit(1)).as("cnt"),
          sum(col("o_orderkey")).as("sum_ok"),
          count(col("o_orderkey")).as("cnt_ok")),
        invertible = true)
      graft.plans.MatViewCatalog.register(defn)
      IncrementalView.refresh(s, defn)
      graft.sources.CommitLog.upsert(s,
        slice.filter(col("o_orderkey") > 30000L),
        base, Seq("o_orderkey"), "o_orderpriority")
      IncrementalView.refresh(s, defn)
      // the RELY declarations, through the audit gate: trust only what
      // the data passed (unique dim key, every fk present)
      val ok = graft.plans.ConstraintCatalog.declareAudited(
        s, base, "o_custkey", s"$d/customer.parquet", "c_custkey")
      require(ok, "q159 RI audit failed — constraints not declared")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      defn
    })

  private def q159StarView(s: SparkSession, d: String): DataFrame = {
    val defn = q159View(s, d)
    IncrementalView.refresh(s, defn)
    val customer = s.read.parquet(s"$d/customer.parquet")
    graft.sources.CommitLog.read(s, defn.baseDir)
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_ok"))
      .select(col("o_custkey").as("ck"), col("n"), col("sum_ok"))
      .orderBy(col("ck")).limit(500)
  }

  private val q159Sql =
    """SELECT o_custkey AS ck, count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_ok
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderkey <= 40000
      |GROUP BY 1 ORDER BY ck LIMIT 500""".stripMargin

  // ----------------------------------------------- q157_clustered_scan
  // Clustered compaction restoring zone-map pruning
  // (CommitLog.compactClustered): the fixture writes a lineitem slice
  // in ARRIVAL order (hash-shuffled — every file spans the whole
  // l_orderkey range, so the committed stats prune nothing), inits the
  // log with l_orderkey stats, then runs ONE clustered compaction. The
  // query is q137's range aggregate, answered through the log's
  // stats-pruned scanRange over the now range-clustered files — the
  // maintenance verb that turns a streamed-in lakehouse table back into
  // a skippable one. Pruning engagement is pinned in CommitLogSpec
  // (≤2 of 8 files for a 5% range); the DuckDB oracle hash-matches the
  // data result. Fixture built once per session (q137 discipline).
  private val q157Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q157Lake(s: SparkSession, d: String): String =
    q157Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q157_")
      val lake = s"$work/lake"
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_discount"),
          hash(col("l_orderkey").cast("int"), col("l_quantity")).as("shuf"))
        .repartition(16, col("shuf")).drop("shuf")
        .write.parquet(lake)
      graft.sources.CommitLog.init(s, lake, statsCols = Seq("l_orderkey"))
      graft.sources.CommitLog.compactClustered(s, lake, 16, Seq("l_orderkey"))
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q157ClusteredScan(s: SparkSession, d: String): DataFrame = {
    val (pruned, _) =
      graft.sources.CommitLog.scanRange(s, q157Lake(s, d), "l_orderkey", 1000L, 3000L)
    pruned.agg(
      count(lit(1)).as("n"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
      sum(col("l_discount").cast("decimal(18,4)")).cast("double").as("sum_disc"))
  }

  // --------------------------------------------------- q140_commitlog
  // The versioned commit log (graft.sources.CommitLog) exercised as a
  // full lifecycle whose FINAL STATE is DuckDB-oracle-checkable: seed a
  // flag-partitioned lineitem slice, init the log with l_orderkey stats,
  // upsert a keyed quantity bump as batch 1, REPLAY batch 1 (must be a
  // no-op — the exactly-once ledger rides the commit), copy-on-write
  // compact, then answer a range query through the committed zone-map
  // stats. Like q137, the lifecycle is the fixture (built once per
  // session); the timed query is the pruned scan + aggregate.
  private val q140Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q140Lake(s: SparkSession, d: String): String =
    q140Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q140_")
      val lake = s"$work/lake"
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag").as("flag"))
      li.write.partitionBy("flag").parquet(lake)
      graft.sources.CommitLog.init(s, lake, statsCols = Seq("l_orderkey"),
        sketchCols = Seq("l_quantity"))
      val updates = li.filter(col("l_orderkey") <= 500)
        .withColumn("l_quantity", col("l_quantity") + lit(5.0))
      def applyBatch(): Unit = graft.sources.CommitLog.upsert(
        s, updates, lake, Seq("l_orderkey", "l_linenumber"), "flag",
        batchId = Some(1L))
      applyBatch()
      applyBatch() // at-least-once replay: committed batch id → no-op
      graft.sources.CommitLog.compact(s, lake, targetPartitions = 2)
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q140CommitLog(s: SparkSession, d: String): DataFrame = {
    val (pruned, _) = graft.sources.CommitLog.scanRange(
      s, q140Lake(s, d), "l_orderkey", 1L, 1000L)
    pruned.groupBy(col("flag")).agg(
      count(lit(1)).as("n"),
      sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("flag"))
  }

  private val q140Sql =
    """SELECT l_returnflag AS flag, count(*) AS n,
      |  CAST(sum(CAST(CASE WHEN l_orderkey <= 500
      |                     THEN l_quantity + 5.0 ELSE l_quantity END
      |                AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey >= 1 AND l_orderkey <= 1000
      |GROUP BY 1 ORDER BY flag""".stripMargin

  // ------------------------------------------- q141_txn / q142_changes
  // Optimistic concurrency + incremental reads on the commit log, as a
  // deterministic interleaving whose FINAL STATE (q141) and CHANGE FEED
  // (q142) are both DuckDB-oracle-checkable. The interleaving forces the
  // rebase path: writer A STAGES an upsert of flag=A rows against v1,
  // writer B commits an upsert of flag=R rows (v2) before A commits, so
  // A's CAS loses, detects the disjoint partitions, and rebases to v3 —
  // the multi-writer serialization the reference gets from Postgres row
  // locks, exercised end-to-end through the oracle gate.
  private val q141Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q141Lake(s: SparkSession, d: String): String =
    q141Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q141_")
      val lake = s"$work/lake"
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag").as("flag"))
      li.write.partitionBy("flag").parquet(lake)
      graft.sources.CommitLog.init(s, lake)
      val upA = li.filter(col("flag") === "A" && col("l_orderkey") <= 500)
        .withColumn("l_quantity", col("l_quantity") + lit(5.0))
      val upB = li.filter(col("flag") === "R" && col("l_orderkey") <= 800)
        .withColumn("l_quantity", col("l_quantity") + lit(7.0))
      // A stages first but commits LAST — the commit must rebase over B
      val stagedA = graft.sources.CommitLog.stageUpsert(
        s, upA, lake, Seq("l_orderkey", "l_linenumber"), "flag").get
      graft.sources.CommitLog.upsert(
        s, upB, lake, Seq("l_orderkey", "l_linenumber"), "flag")
      val v3 = graft.sources.CommitLog.commitStaged(s, lake, stagedA)
      require(v3.version == 3L, s"expected the rebase to land v3, got $v3")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q141Txn(s: SparkSession, d: String): DataFrame =
    graft.sources.CommitLog.read(s, q141Lake(s, d))
      .groupBy(col("flag")).agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("flag"))

  private val q141Sql =
    """SELECT l_returnflag AS flag, count(*) AS n,
      |  CAST(sum(CAST(CASE
      |    WHEN l_returnflag = 'A' AND l_orderkey <= 500 THEN l_quantity + 5.0
      |    WHEN l_returnflag = 'R' AND l_orderkey <= 800 THEN l_quantity + 7.0
      |    ELSE l_quantity END AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey <= 2000
      |GROUP BY 1 ORDER BY flag""".stripMargin

  /** The incremental consumer's view: every row the two data commits
    * published (post-image of the touched partitions), straight off the
    * log's file diff — no lake scan, no state diffing. */
  private def q142Changes(s: SparkSession, d: String): DataFrame =
    graft.sources.CommitLog.changesBetween(s, q141Lake(s, d), 1L, 3L)
      .groupBy(col("flag")).agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("flag"))

  private val q142Sql =
    """SELECT l_returnflag AS flag, count(*) AS n,
      |  CAST(sum(CAST(CASE
      |    WHEN l_returnflag = 'A' AND l_orderkey <= 500 THEN l_quantity + 5.0
      |    WHEN l_returnflag = 'R' AND l_orderkey <= 800 THEN l_quantity + 7.0
      |    ELSE l_quantity END AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey <= 2000 AND l_returnflag IN ('A', 'R')
      |GROUP BY 1 ORDER BY flag""".stripMargin

  // -------------------------------------------- q146_manifest_quantiles
  // Percentile queries answered ENTIRELY from the commit log's metadata
  // plane: q140's lake commits a per-file KLL(l_quantity) sketch with
  // every version (init → upsert → replay → compact), and this query
  // merges ONLY the committed manifest sketches — zero data files opened
  // — per partition restriction. The exact per-flag quantiles computed
  // from the data ride alongside so the estimate's rank error is visible
  // in the output. Estimates are randomized-compaction-specific → rows
  // only; CommitLogSpec pins the rank-error bound, the post-upsert
  // freshness (the sketches see the rewritten partition with no rebuild
  // call), and the post-compact consistency.
  private def q146ManifestQuantiles(s: SparkSession, d: String): DataFrame = {
    import graft.sources.CommitLog
    val lake = q140Lake(s, d)
    val flags = Seq("A", "N", "R")
    val rows = flags.flatMap { f =>
      CommitLog.quantiles(s, lake, "l_quantity", Seq(0.5, 0.95),
        partitionPrefix = Some(s"flag=$f"))
        .map(q => (f, q.head, q(1)))
    }
    val est = s.createDataFrame(rows).toDF("flag", "p50_est", "p95_est")
    val exact = CommitLog.read(s, lake)
      .groupBy(col("flag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("p50_exact"),
        expr("percentile(l_quantity, 0.95)").as("p95_exact"))
    est.join(exact, Seq("flag")).orderBy(col("flag"))
  }

  // ------------------------------------------------------- q148_delete
  // Copy-on-write DELETE on the commit log: seed a status-partitioned
  // orders slice (o_orderkey is the table's true unique key — keyed
  // upserts need one), delete the low-price rows (file-granular rewrite
  // — only files holding matches are touched), then aggregate the final
  // state under a DuckDB oracle whose WHERE applies the inverse
  // predicate. Schema evolution is exercised in the same lifecycle: an
  // upsert ADDS an audit column after the delete, and the final schema
  // carries it with old rows null (counted in the output).
  private val q148Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q148Lake(s: SparkSession, d: String): String =
    q148Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q148_")
      val lake = s"$work/lake"
      val ords = Tables.orders(s, d).filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
      ords.write.partitionBy("flag").parquet(lake)
      graft.sources.CommitLog.init(s, lake)
      graft.sources.CommitLog.delete(s, lake, col("o_totalprice") < 50000.0)
      // additive evolution after the delete: tag the surviving mid-band
      // orders; every other row reads the new column as null
      val tagged = ords
        .filter(col("o_totalprice") >= 50000.0 && col("o_totalprice") < 80000.0)
        .withColumn("band", lit("mid"))
      graft.sources.CommitLog.upsert(s, tagged, lake, Seq("o_orderkey"), "flag")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q148Delete(s: SparkSession, d: String): DataFrame =
    graft.sources.CommitLog.read(s, q148Lake(s, d))
      .groupBy(col("flag")).agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        sum(when(col("band") === "mid", 1L).otherwise(0L)).as("n_mid"))
      .orderBy(col("flag"))

  private val q148Sql =
    """SELECT o_orderstatus AS flag, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  CAST(sum(CASE WHEN o_totalprice >= 50000 AND o_totalprice < 80000
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_mid
      |FROM orders
      |WHERE o_orderkey <= 20000 AND o_totalprice >= 50000
      |GROUP BY 1 ORDER BY flag""".stripMargin

  // -------------------------------------------------------- q169_merge
  // General conditional MERGE (CommitLog.merge): one commit applies all
  // three clauses against a status-partitioned orders slice — matched
  // low-price rows DELETE, the rest UPDATE to a repriced source image
  // when the new price stays under a cap, and unmatched source rows
  // INSERT unless in status 'P'. The DuckDB oracle recomputes the final
  // state from the raw orders table with the same clause algebra
  // (LEFT JOIN + CASE for matched rows, anti-join for inserts), so the
  // hash-match proves the clause ordering (delete before update), the
  // keep-unmatched-target rule, and the insert filter all landed
  // exactly. Clause conditions reference BOTH images (t.* / s.*).
  private val q169Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q169Lake(s: SparkSession, d: String): String =
    q169Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q169_")
      val lake = s"$work/lake"
      val ords = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
      // orderkeys are dense 0..K in the testdata; split at thirds of K so
      // every clause fires at ANY scale factor (matched: (K/3, 2K/3],
      // inserts: (2K/3, K]) — the oracle recomputes the same split with
      // integer division in a scalar subquery
      val k = Tables.orders(s, d).agg(max(col("o_orderkey"))).head.getLong(0)
      ords.filter(col("o_orderkey") <= 2 * k / 3)
        .write.partitionBy("flag").parquet(lake)
      graft.sources.CommitLog.init(s, lake)
      val src = ords
        .filter(col("o_orderkey") > k / 3)
        .withColumn("o_totalprice", col("o_totalprice") + lit(10000.0))
      graft.sources.CommitLog.merge(s, lake, src,
        Seq("o_orderkey"), "flag",
        updateWhen = Some("s.o_totalprice < 150000.0"),
        deleteWhen = Some("t.o_totalprice < 25000.0"),
        insertWhen = Some("s.flag <> 'P'"))
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q169Merge(s: SparkSession, d: String): DataFrame =
    graft.sources.CommitLog.read(s, q169Lake(s, d))
      .groupBy(col("flag")).agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("flag"))

  private val q169Sql =
    """WITH mk AS (SELECT max(o_orderkey) AS k FROM orders),
      |     t AS (SELECT o_orderkey AS k, o_totalprice AS p,
      |                 o_orderstatus AS f
      |           FROM orders
      |           WHERE o_orderkey <= (SELECT 2 * k // 3 FROM mk)),
      |     s AS (SELECT o_orderkey AS k, o_totalprice + 10000.0 AS p,
      |                  o_orderstatus AS f
      |           FROM orders
      |           WHERE o_orderkey > (SELECT k // 3 FROM mk)),
      |     kept AS (
      |       SELECT t.k,
      |              CASE WHEN s.k IS NOT NULL AND NOT (t.p < 25000.0)
      |                        AND s.p < 150000.0 THEN s.p ELSE t.p END AS p,
      |              t.f
      |       FROM t LEFT JOIN s ON t.k = s.k
      |       WHERE s.k IS NULL OR NOT (t.p < 25000.0)),
      |     ins AS (
      |       SELECT s.k, s.p, s.f FROM s LEFT JOIN t ON s.k = t.k
      |       WHERE t.k IS NULL AND s.f <> 'P')
      |SELECT f AS flag, count(*) AS n,
      |  CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      |GROUP BY 1 ORDER BY flag""".stripMargin

  // ---------------------------------------------------------- q170_wap
  // Write-audit-publish over lake refs (LakeRefs): ingest commits land
  // in the log but consumers follow the PUBLISHED pointer, which only
  // advances when the declarative constraint audit passes. The fixture
  // publishes the seed, lands a good batch (audited → published), then
  // lands a BAD batch (negated prices → audit blocks, pointer frozen).
  // The query reads through the published pointer; the DuckDB oracle
  // recomputes the state as of the GOOD batch from raw orders, so the
  // hash-match proves the bad commit is invisible to consumers with no
  // rollback having run, and n_neg = 0 pins that not one poisoned row
  // leaked past the audit gate.
  private val q170Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q170Lake(s: SparkSession, d: String): String =
    q170Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q170_")
      val lake = s"$work/lake"
      val ords = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
      // orderkeys are dense 0..K; thirds-of-K split keeps every stage
      // non-empty at any scale factor (oracle mirrors it with integer
      // division in a scalar subquery)
      val k = Tables.orders(s, d).agg(max(col("o_orderkey"))).head.getLong(0)
      ords.filter(col("o_orderkey") <= k / 3)
        .write.partitionBy("flag").parquet(lake)
      val v1 = graft.sources.CommitLog.init(s, lake).version
      graft.sources.LakeRefs.publish(s, lake, v1)
      val checks = Seq(graft.ops.Constraints.Bounds("o_totalprice", 0, 1e9),
        graft.ops.Constraints.NotNull("o_orderkey"))
      // good batch: new keys, clean prices → audit passes, published
      val good = ords
        .filter(col("o_orderkey") > k / 3 && col("o_orderkey") <= 2 * k / 3)
      val v2 = graft.sources.CommitLog.upsert(s, good, lake,
        Seq("o_orderkey"), "flag").version
      val (ok2, _) = graft.sources.LakeRefs.publishAudited(s, lake, v2, checks)
      require(ok2, "q170 fixture: the clean batch must publish")
      // bad batch: poisoned prices → audit blocks, pointer stays at v2
      val bad = ords
        .filter(col("o_orderkey") > 2 * k / 3)
        .withColumn("o_totalprice", negate(col("o_totalprice")))
      val v3 = graft.sources.CommitLog.upsert(s, bad, lake,
        Seq("o_orderkey"), "flag").version
      val (ok3, _) = graft.sources.LakeRefs.publishAudited(s, lake, v3, checks)
      require(!ok3, "q170 fixture: the poisoned batch must be blocked")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q170Wap(s: SparkSession, d: String): DataFrame =
    graft.sources.LakeRefs.readPublished(s, q170Lake(s, d))
      .groupBy(col("flag")).agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        sum(when(col("o_totalprice") < 0, 1L).otherwise(0L)).as("n_neg"))
      .orderBy(col("flag"))

  private val q170Sql =
    """SELECT o_orderstatus AS flag, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  CAST(0 AS BIGINT) AS n_neg
      |FROM orders
      |WHERE o_orderkey <= (SELECT 2 * max(o_orderkey) // 3 FROM orders)
      |GROUP BY 1 ORDER BY flag""".stripMargin

  // -------------------------------------------------- q171_meta_groupby
  // GROUPED metadata-plane aggregates (CommitLog.statsAggByPartition):
  // per-partition count/min/max answered ENTIRELY from the committed
  // stats manifest — the partition value is recovered from each manifest
  // row's key=value path component, so "GROUP BY partition" costs one
  // kilobyte metadata read at any lake size, zero data files opened
  // (MetadataPlaneSpec proves by deleting the data files and asking
  // again). The fixture ingests in two commits (init + upsert) so the
  // hash-match also pins post-upsert freshness of the incremental
  // manifest. The DuckDB oracle executes the real GROUP BY over raw
  // orders.
  private val q171Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q171Lake(s: SparkSession, d: String): String =
    q171Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q171_")
      val lake = s"$work/lake"
      val ords = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
      val k = Tables.orders(s, d).agg(max(col("o_orderkey"))).head.getLong(0)
      ords.filter(col("o_orderkey") <= k / 2)
        .write.partitionBy("flag").parquet(lake)
      graft.sources.CommitLog.init(s, lake,
        statsCols = Seq("o_totalprice", "o_orderkey"))
      graft.sources.CommitLog.upsert(s,
        ords.filter(col("o_orderkey") > k / 2), lake,
        Seq("o_orderkey"), "flag")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q171MetaGroupby(s: SparkSession, d: String): DataFrame =
    graft.sources.CommitLog.statsAggByPartition(s, q171Lake(s, d),
        Seq("o_totalprice", "o_orderkey"))
      .select(col("flag"), col("rows").as("n"),
        col("min_o_totalprice").as("min_price"),
        col("max_o_totalprice").as("max_price"),
        col("count_o_totalprice").as("n_price"),
        col("min_o_orderkey").as("min_key"),
        col("max_o_orderkey").as("max_key"))
      .orderBy(col("flag"))

  private val q171Sql =
    """SELECT o_orderstatus AS flag, count(*) AS n,
      |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
      |  count(o_totalprice) AS n_price,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders
      |GROUP BY 1 ORDER BY flag""".stripMargin

  // --------------------------------------------------- q176_delete_mor
  // MERGE-ON-READ delete (CommitLog.deleteVectors): q148's exact
  // lifecycle — seed, delete the low-price rows, evolve the schema with
  // a tagging upsert — but the delete is a deletion-vector commit that
  // rewrites ZERO data files (the write-amplification answer for
  // frequent small deletes; DeletionVectorSpec pins file identity).
  // The oracle is q148's own SQL, so the hash-match proves MoR ≡ COW
  // row for row against the independent engine, through the vector-
  // filtered read path, the upsert's old-slice merge, and additive
  // evolution on a vector-carrying table.
  private val q176Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q176Lake(s: SparkSession, d: String): String =
    q176Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q176_")
      val lake = s"$work/lake"
      val ords = Tables.orders(s, d).filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
      ords.write.partitionBy("flag").parquet(lake)
      graft.sources.CommitLog.init(s, lake)
      graft.sources.CommitLog.deleteVectors(s, lake,
        col("o_totalprice") < 50000.0)
      val tagged = ords
        .filter(col("o_totalprice") >= 50000.0 && col("o_totalprice") < 80000.0)
        .withColumn("band", lit("mid"))
      graft.sources.CommitLog.upsert(s, tagged, lake, Seq("o_orderkey"), "flag")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q176DeleteMor(s: SparkSession, d: String): DataFrame =
    graft.sources.CommitLog.read(s, q176Lake(s, d))
      .groupBy(col("flag")).agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        sum(when(col("band") === "mid", 1L).otherwise(0L)).as("n_mid"))
      .orderBy(col("flag"))

  // ----------------------------------------------------- q177_sql_dml
  // The SQL DML front door end-to-end (sources.LakeSqlDml, injected by
  // GraftExtensions): EVERY mutation in this lifecycle is issued as SQL
  // TEXT — a copy-on-write DELETE, a typed UPDATE, the full MERGE
  // clause family (delete-before-update order, conditional INSERT), and
  // a merge-on-read DELETE ... USING DELETION VECTORS — and the serving
  // read is SQL over the graft_lake TVF. The DuckDB oracle recomputes
  // the four-step algebra from raw orders, so the hash-match proves the
  // parser translation (placeholder substitution → Spark grammar →
  // CommitLog verbs) is semantically exact, clause order included.
  // Arithmetic sticks to exact doubles (×2, +10000.0) so the decimal
  // rounding at the end is bit-identical on both engines.
  private val q177Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q177Lake(s: SparkSession, d: String): String =
    q177Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q177_")
      val lake = s"$work/lake"
      val ords = Tables.orders(s, d).filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
      ords.write.partitionBy("flag").parquet(lake)
      graft.sources.CommitLog.init(s, lake)
      s.sql(s"DELETE FROM graft_lake('$lake') WHERE o_custkey % 10 = 3")
      s.sql(s"UPDATE graft_lake('$lake') SET o_totalprice = " +
        "o_totalprice * 2 WHERE o_orderkey <= 5000")
      ords.filter(col("o_orderkey") > 10000)
        .withColumn("o_totalprice", col("o_totalprice") + lit(10000.0))
        .createOrReplaceTempView("q177_src")
      s.sql(
        s"""MERGE INTO graft_lake('$lake') AS t
           |USING q177_src AS s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED AND t.o_totalprice < 30000.0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED AND s.flag <> 'P' THEN INSERT *
           |""".stripMargin)
      s.sql(s"DELETE FROM graft_lake('$lake') WHERE o_custkey % 10 = 7 " +
        "USING DELETION VECTORS")
      // round-11: COLUMN-LEVEL merge — a slim delta source (key +
      // partition + one clause input, NOT the full row) updates one
      // column with an expression over both namespaces and inserts
      // with an explicit column list; * 0.5 is binary-exact
      Tables.orders(s, d)
        .filter(col("o_orderkey") >= 15000 && col("o_orderkey") <= 25000)
        .select(col("o_orderkey"), col("o_orderstatus").as("flag"),
          (col("o_totalprice") * 0.5).as("delta"))
        .createOrReplaceTempView("q177_src2")
      s.sql(
        s"""MERGE INTO graft_lake('$lake') AS t
           |USING q177_src2 AS s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED THEN UPDATE SET
           |  o_totalprice = t.o_totalprice + s.delta
           |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey,
           |  o_totalprice, flag) VALUES (s.o_orderkey, -1L, s.delta,
           |  s.flag)""".stripMargin)
      // round-12: WRITE-SIDE SCHEMA EVOLUTION through SQL MERGE — the
      // session conf opts in, a column-level UPDATE assigns a NEW
      // column `rebate` which auto-ADDs (typed by its expression);
      // rows no clause touches read null. * 0.25 is binary-exact.
      s.conf.set("spark.graft.merge.schemaEvolution", "true")
      try {
        Tables.orders(s, d).filter(col("o_orderkey") <= 8000)
          .select(col("o_orderkey"), col("o_orderstatus").as("flag"),
            (col("o_totalprice") * 0.25).as("r"))
          .createOrReplaceTempView("q177_src3")
        s.sql(
          s"""MERGE INTO graft_lake('$lake') AS t
             |USING q177_src3 AS s
             |ON t.o_orderkey = s.o_orderkey
             |WHEN MATCHED THEN UPDATE SET rebate = s.r""".stripMargin)
      } finally s.conf.unset("spark.graft.merge.schemaEvolution")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q177SqlDml(s: SparkSession, d: String): DataFrame = {
    val lake = q177Lake(s, d)
    s.sql(
      s"""SELECT flag, count(*) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_price,
         |  min(o_orderkey) AS min_ok,
         |  count(rebate) AS n_rebate,
         |  CAST(sum(CAST(rebate AS DECIMAL(18,4))) AS DOUBLE)
         |    AS sum_rebate
         |FROM graft_lake('$lake')
         |GROUP BY flag ORDER BY flag""".stripMargin)
  }

  private val q177Sql =
    """WITH t0 AS (
      |  SELECT o_orderkey AS k, o_custkey AS c, o_totalprice AS p,
      |         o_orderstatus AS f
      |  FROM orders WHERE o_orderkey <= 20000),
      |t2 AS (
      |  SELECT k, c, CASE WHEN k <= 5000 THEN p * 2 ELSE p END AS p, f
      |  FROM t0 WHERE c % 10 <> 3),
      |s AS (SELECT k, c, p + 10000.0 AS p, f FROM t0 WHERE k > 10000),
      |kept AS (
      |  SELECT t2.k, t2.c,
      |         CASE WHEN s.k IS NOT NULL THEN s.p ELSE t2.p END AS p,
      |         t2.f
      |  FROM t2 LEFT JOIN s ON t2.k = s.k
      |  WHERE s.k IS NULL OR NOT (t2.p < 30000.0)),
      |ins AS (
      |  SELECT s.k, s.c, s.p, s.f FROM s LEFT JOIN t2 ON s.k = t2.k
      |  WHERE t2.k IS NULL AND s.f <> 'P'),
      |t4 AS (
      |  SELECT * FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      |  WHERE c % 10 <> 7),
      |s2 AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS f,
      |         o_totalprice * 0.5 AS delta
      |  FROM orders WHERE o_orderkey BETWEEN 15000 AND 25000),
      |t5 AS (
      |  SELECT t4.k, t4.c,
      |         t4.p + CASE WHEN s2.k IS NOT NULL THEN s2.delta
      |                     ELSE 0 END AS p,
      |         t4.f
      |  FROM t4 LEFT JOIN s2 ON t4.k = s2.k
      |  UNION ALL
      |  SELECT s2.k, -1, s2.delta, s2.f
      |  FROM s2 LEFT JOIN t4 ON s2.k = t4.k WHERE t4.k IS NULL),
      |s3 AS (
      |  SELECT o_orderkey AS k, o_totalprice * 0.25 AS r
      |  FROM orders WHERE o_orderkey <= 8000),
      |t6 AS (
      |  SELECT t5.k, t5.p, t5.f, s3.r FROM t5 LEFT JOIN s3 ON t5.k = s3.k)
      |SELECT f AS flag, count(*) AS n,
      |  CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  min(k) AS min_ok,
      |  count(r) AS n_rebate,
      |  CAST(sum(CAST(r AS DECIMAL(18,4))) AS DOUBLE) AS sum_rebate
      |FROM t6 GROUP BY 1 ORDER BY flag""".stripMargin

  // ---------------------------------------------------- q178_sql_insert
  // The pure-append SQL surface end-to-end: INSERT INTO ... SELECT (an
  // append commit — new files only, ZERO partition rewrite, the write
  // verb for append-heavy ingestion at scale), INSERT ... VALUES
  // (positional binding onto the committed schema), then
  // CALL graft_compact issued as SQL — the maintenance verb must
  // preserve every appended row bit-exactly. The DuckDB oracle
  // recomputes the union algebra from raw orders, so the hash-match
  // proves the whole front door (parse → CommitLog.append → compact).
  // Arithmetic sticks to exact doubles (/2, binary-exact literals).
  private val q178Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q178Lake(s: SparkSession, d: String): String =
    q178Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q178_")
      val lake = s"$work/lake"
      Tables.orders(s, d).filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
        .write.partitionBy("flag").parquet(lake)
      graft.sources.CommitLog.init(s, lake)
      Tables.orders(s, d)
        .filter(col("o_orderkey") > 20000 && col("o_orderkey") <= 30000)
        .createOrReplaceTempView("q178_src")
      s.sql(
        s"""INSERT INTO graft_lake('$lake')
           |SELECT o_orderkey + 1000000, o_custkey, o_totalprice / 2,
           |       o_orderstatus
           |FROM q178_src""".stripMargin)
      s.sql(s"INSERT INTO graft_lake('$lake') VALUES " +
        "(9999991, 1, 111.25, 'F'), (9999992, 2, 222.5, 'O')")
      s.sql(s"CALL graft_compact('$lake', 2)")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q178SqlInsert(s: SparkSession, d: String): DataFrame = {
    val lake = q178Lake(s, d)
    s.sql(
      s"""SELECT flag, count(*) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_price,
         |  CAST(min(o_orderkey) AS BIGINT) AS min_ok,
         |  CAST(max(o_orderkey) AS BIGINT) AS max_ok
         |FROM graft_lake('$lake')
         |GROUP BY flag ORDER BY flag""".stripMargin)
  }

  private val q178Sql =
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS f
      |  FROM orders WHERE o_orderkey <= 20000),
      |ins AS (
      |  SELECT o_orderkey + 1000000 AS k, o_totalprice / 2 AS p,
      |         o_orderstatus AS f
      |  FROM orders WHERE o_orderkey > 20000 AND o_orderkey <= 30000),
      |vals(k, p, f) AS (VALUES (9999991, 111.25, 'F'), (9999992, 222.5, 'O')),
      |t AS (SELECT * FROM base UNION ALL SELECT * FROM ins
      |      UNION ALL SELECT k, CAST(p AS DOUBLE), f FROM vals)
      |SELECT f AS flag, count(*) AS n,
      |  CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  CAST(min(k) AS BIGINT) AS min_ok,
      |  CAST(max(k) AS BIGINT) AS max_ok
      |FROM t GROUP BY 1 ORDER BY flag""".stripMargin

  // ------------------------------------------------------ q179_lake_cdf
  // Row-level change data feed: after a COW delete, a SQL UPDATE, and a
  // pure append, graft_lake_cdf(v1, v4) must emit EXACTLY the inserted
  // rows, the deleted rows' pre-images, and the updated rows' pre/post
  // pairs — and NOTHING for rows the file-granular rewrites republished
  // unchanged (the UPDATE rewrites whole files; its untouched rows must
  // be value-compared away). The DuckDB oracle recomputes the diff from
  // first principles with anti/inner joins over the simulated pre/post
  // states. Arithmetic is exact-double (×2) so pre/post images compare
  // bit-identically.
  private val q179Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q179Lake(s: SparkSession, d: String): String =
    q179Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q179_")
      val lake = s"$work/lake"
      Tables.orders(s, d).filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
        .write.partitionBy("flag").parquet(lake)
      graft.sources.CommitLog.init(s, lake)
      s.sql(s"DELETE FROM graft_lake('$lake') WHERE o_custkey % 10 = 3")
      s.sql(s"UPDATE graft_lake('$lake') SET o_totalprice = " +
        "o_totalprice * 2 WHERE o_orderkey <= 5000")
      Tables.orders(s, d).filter(col("o_orderkey") <= 1000)
        .createOrReplaceTempView("q179_src")
      s.sql(
        s"""INSERT INTO graft_lake('$lake')
           |SELECT o_orderkey + 1000000, o_custkey, o_totalprice,
           |       o_orderstatus
           |FROM q179_src""".stripMargin)
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q179LakeCdf(s: SparkSession, d: String): DataFrame = {
    val lake = q179Lake(s, d)
    val toV = graft.sources.CommitLog.latest(s, lake).get.version
    s.sql(
      s"""SELECT _change_type, o_orderkey AS k, o_custkey AS c,
         |       o_totalprice AS p, flag
         |FROM graft_lake_cdf('$lake', 1, $toV, 'o_orderkey')
         |ORDER BY _change_type, k""".stripMargin)
  }

  private val q179Sql =
    """WITH pre AS (
      |  SELECT o_orderkey AS k, o_custkey AS c, o_totalprice AS p,
      |         o_orderstatus AS f
      |  FROM orders WHERE o_orderkey <= 20000),
      |post AS (
      |  SELECT k, c, CASE WHEN k <= 5000 THEN p * 2 ELSE p END AS p, f
      |  FROM pre WHERE c % 10 <> 3
      |  UNION ALL
      |  SELECT k + 1000000 AS k, c, p, f FROM pre WHERE k <= 1000),
      |ct AS (
      |  SELECT 'insert' AS t, q.k, q.c, q.p, q.f
      |  FROM post q LEFT JOIN pre r ON q.k = r.k WHERE r.k IS NULL
      |  UNION ALL
      |  SELECT 'delete', r.k, r.c, r.p, r.f
      |  FROM pre r LEFT JOIN post q ON r.k = q.k WHERE q.k IS NULL
      |  UNION ALL
      |  SELECT 'update_preimage', r.k, r.c, r.p, r.f
      |  FROM pre r JOIN post q ON r.k = q.k
      |  WHERE r.c IS DISTINCT FROM q.c OR r.p IS DISTINCT FROM q.p
      |     OR r.f IS DISTINCT FROM q.f
      |  UNION ALL
      |  SELECT 'update_postimage', q.k, q.c, q.p, q.f
      |  FROM pre r JOIN post q ON r.k = q.k
      |  WHERE r.c IS DISTINCT FROM q.c OR r.p IS DISTINCT FROM q.p
      |     OR r.f IS DISTINCT FROM q.f)
      |SELECT t AS _change_type, k, c, p, f AS flag
      |FROM ct ORDER BY _change_type, k""".stripMargin

  // ------------------------------------------------ q182_cdf_by_commit
  // Per-commit CDF attribution over q179's lifecycle: each delta row is
  // tagged with the version that produced it — the delete's pre-images
  // carry v2, the update pairs v3, the appended rows v4. The DuckDB
  // oracle recomputes every commit's delta from first principles with
  // its literal version tag, so the hash-match proves both the row
  // algebra AND the attribution boundaries (a row republished unchanged
  // by the v3 file rewrite must not be attributed to v3).
  private def q182CdfByCommit(s: SparkSession, d: String): DataFrame = {
    val lake = q179Lake(s, d)
    s.sql(
      s"""SELECT _commit_version AS v, _change_type,
         |       o_orderkey AS k, o_custkey AS c, o_totalprice AS p, flag
         |FROM graft_lake_cdf_by_commit('$lake', 1, 4, 'o_orderkey')
         |ORDER BY v, _change_type, k""".stripMargin)
  }

  private val q182Sql =
    """WITH pre AS (
      |  SELECT o_orderkey AS k, o_custkey AS c, o_totalprice AS p,
      |         o_orderstatus AS f
      |  FROM orders WHERE o_orderkey <= 20000),
      |s2 AS (SELECT * FROM pre WHERE c % 10 <> 3),
      |ct AS (
      |  SELECT 2 AS v, 'delete' AS t, k, c, p, f
      |  FROM pre WHERE c % 10 = 3
      |  UNION ALL
      |  SELECT 3, 'update_preimage', k, c, p, f FROM s2 WHERE k <= 5000
      |  UNION ALL
      |  SELECT 3, 'update_postimage', k, c, p * 2, f
      |  FROM s2 WHERE k <= 5000
      |  UNION ALL
      |  SELECT 4, 'insert', k + 1000000, c, p, f
      |  FROM pre WHERE k <= 1000)
      |SELECT CAST(v AS BIGINT) AS v, t AS _change_type, k, c, p,
      |       f AS flag
      |FROM ct ORDER BY v, _change_type, k""".stripMargin

  // ------------------------------------------------ q180_cdf_mirror
  // Keyed CDC replica maintained from the row-level change feed: the
  // replica is partitioned by a DERIVED key bucket — a layout the
  // partition-swap mirror (q168) cannot serve — bootstrapped at the
  // source's PRE-mutation cut, then the whole mutation range's CDF
  // (q179's lake: COW delete + UPDATE + append) is applied as ONE
  // atomic merge (inserts/postimages upsert, deletes tombstone via the
  // clause-only __cdc_delete flag, batchId = source version for
  // exactly-once replay). The DuckDB oracle recomputes the source's
  // post state from first principles and buckets it — a hash-match
  // proves the replica converged row for row under re-partitioning.
  private val q180Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q180Replica(s: SparkSession, d: String): String =
    q180Lakes.getOrElseUpdate(d, {
      val srcLake = q179Lake(s, d)
      val work = java.nio.file.Files.createTempDirectory("graft_q180_")
      val rep = s"$work/replica"
      val derive = (df: DataFrame) =>
        df.withColumn("bucket", pmod(col("o_orderkey"), lit(4L)))
      derive(graft.sources.CommitLog.readAt(s, srcLake, 1L))
        .write.partitionBy("bucket").parquet(rep)
      graft.sources.CommitLog.init(s, rep, initBatches = Seq(1L))
      graft.streaming.LakeFollow.applyCdf(s, srcLake, rep,
        Seq("o_orderkey"), "bucket", derive)
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      rep
    })

  private def q180CdfMirror(s: SparkSession, d: String): DataFrame = {
    val rep = q180Replica(s, d)
    graft.sources.CommitLog.read(s, rep)
      .groupBy(col("bucket"), col("flag"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("sum_price"),
        min(col("o_orderkey")).as("min_ok"),
        max(col("o_orderkey")).as("max_ok"))
      .orderBy(col("bucket"), col("flag"))
  }

  private val q180Sql =
    """WITH pre AS (
      |  SELECT o_orderkey AS k, o_custkey AS c, o_totalprice AS p,
      |         o_orderstatus AS f
      |  FROM orders WHERE o_orderkey <= 20000),
      |post AS (
      |  SELECT k, c, CASE WHEN k <= 5000 THEN p * 2 ELSE p END AS p, f
      |  FROM pre WHERE c % 10 <> 3
      |  UNION ALL
      |  SELECT k + 1000000 AS k, c, p, f FROM pre WHERE k <= 1000)
      |SELECT k % 4 AS bucket, f AS flag, count(*) AS n,
      |  CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  CAST(min(k) AS BIGINT) AS min_ok,
      |  CAST(max(k) AS BIGINT) AS max_ok
      |FROM post GROUP BY 1, 2 ORDER BY bucket, flag""".stripMargin

  // ------------------------------------------------ q188_compact_where
  // PARTITION-SCOPED OPTIMIZE end to end: a fragmented hive-partitioned
  // lake (four appends per flag), a MoR delete whose single vector file
  // spans several partitions, then CALL graft_compact_where on ONE flag
  // — the selected partition collapses to one file with its tombstones
  // materialized, the vector rewrites to its kept slice, every other
  // partition keeps byte-identical files (pinned in
  // CompactPartitionsSpec). The serving aggregate reads the mixed
  // compacted/fragmented table; the DuckDB oracle recomputes the same
  // delete algebra from raw orders, so the hash-match proves the
  // rewrite is row-exact. At 100 TB this is THE maintenance verb:
  // compact yesterday's partition while today keeps appending
  // (concurrent-commit rebase pinned in the spec).
  private val q188Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q188Lake(s: SparkSession, d: String): String =
    q188Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q188_")
      val lake = s"$work/lake"
      val ords = Tables.orders(s, d).filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
      // four fragmented appends per partition
      (0 until 4).foreach { i =>
        val slice = ords.filter(col("o_orderkey") % 4 === i)
        if (i == 0) {
          slice.write.partitionBy("flag").parquet(lake)
          graft.sources.CommitLog.init(s, lake)
        } else graft.sources.CommitLog.append(s, slice, lake)
      }
      s.sql(s"DELETE FROM graft_lake('$lake') WHERE o_orderkey % 10 = 3 " +
        "USING DELETION VECTORS")
      s.sql(s"CALL graft_compact_where('$lake', \"flag = 'F'\", 1)")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q188CompactWhere(s: SparkSession, d: String): DataFrame = {
    val lake = q188Lake(s, d)
    s.sql(
      s"""SELECT flag, count(*) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_price,
         |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
         |FROM graft_lake('$lake')
         |GROUP BY flag ORDER BY flag""".stripMargin)
  }

  private val q188Sql =
    """SELECT o_orderstatus AS flag, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
      |FROM orders
      |WHERE o_orderkey <= 20000 AND o_orderkey % 10 <> 3
      |GROUP BY 1 ORDER BY flag""".stripMargin

  // ------------------------------------------------------- q191_branch
  // ZERO-COPY BRANCHING end to end: an orders lake forks a branch (one
  // version file, no data movement), the branch takes a COW DELETE and
  // an append through the SQL DML surface addressing `lake@fix`, and
  // the MAIN line appends a different slice AFTER the fork. The serving
  // aggregate reads the BRANCH: it must carry the branch's delete and
  // append and must NOT see main's post-fork commit — the DuckDB oracle
  // recomputes exactly that state from raw orders, so the hash-match
  // proves isolation and branch-DML row-exactness at once. At 100 TB
  // this is the experiment-without-a-copy shape: fork, mutate, validate
  // (then fastForward or drop — both exercised in BranchSpec); vacuum
  // unions every branch's references, which is what makes the fork
  // genuinely zero-copy rather than merely cheap.
  private val q191Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q191Lake(s: SparkSession, d: String): String =
    q191Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q191_")
      val lake = s"$work/lake"
      val ords = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
      ords.filter(col("o_orderkey") <= 20000)
        .write.partitionBy("flag").parquet(lake)
      graft.sources.CommitLog.init(s, lake)
      s.sql(s"CALL graft_branch('$lake', 'fix')")
      // branch-side DML through the SQL surface, addressing lake@fix
      s.sql(s"DELETE FROM graft_lake('$lake@fix') WHERE o_orderkey % 10 = 7")
      graft.sources.CommitLog.append(s,
        ords.filter(col("o_orderkey") > 20000 &&
          col("o_orderkey") <= 25000), s"$lake@fix")
      // main-line commit AFTER the fork — not branch history
      graft.sources.CommitLog.append(s,
        ords.filter(col("o_orderkey") > 25000 &&
          col("o_orderkey") <= 30000), lake)
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q191Branch(s: SparkSession, d: String): DataFrame = {
    val lake = q191Lake(s, d)
    s.sql(
      s"""SELECT flag, count(*) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_price,
         |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
         |FROM graft_lake('$lake@fix')
         |GROUP BY flag ORDER BY flag""".stripMargin)
  }

  private val q191Sql =
    """SELECT o_orderstatus AS flag, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
      |FROM orders
      |WHERE (o_orderkey <= 20000 AND o_orderkey % 10 <> 7)
      |   OR (o_orderkey > 20000 AND o_orderkey <= 25000)
      |GROUP BY 1 ORDER BY flag""".stripMargin

  // ---------------------------------------------------- q192_format_io
  // Batch format("graft-lake") end to end — the Delta-shaped provider
  // triangle's last side: a table is CREATED with
  // df.write.format("graft-lake").partitionBy(...).save, APPENDED with
  // mode(Append), then OVERWRITten per the committed layout, and the
  // serving aggregate reads it back with
  // spark.read.format("graft-lake") — the fast path, a real file-scan
  // relation built from the commit log's file list (LakeBatchSpec pins
  // pushdown/pruning and the zero-listing property; the DV/rename
  // fallback is pinned there too). The DuckDB oracle recomputes the
  // post-overwrite state from raw orders, so the hash-match proves the
  // three write modes landed exactly the commits the Scala verbs would.
  private val q192Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q192Lake(s: SparkSession, d: String): String =
    q192Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q192_")
      val lake = s"$work/lake"
      val ords = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
      ords.filter(col("o_orderkey") <= 10000)
        .write.format("graft-lake").partitionBy("flag").save(lake)
      ords.filter(col("o_orderkey") > 10000 && col("o_orderkey") <= 20000)
        .write.format("graft-lake")
        .mode(org.apache.spark.sql.SaveMode.Append).save(lake)
      // overwrite replaces rows, preserves history (an overwrite commit)
      ords.filter(col("o_orderkey") <= 15000 && col("o_orderkey") % 10 =!= 1)
        .write.format("graft-lake")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).save(lake)
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q192FormatIo(s: SparkSession, d: String): DataFrame = {
    val lake = q192Lake(s, d)
    s.read.format("graft-lake").load(lake)
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        min(col("o_orderkey")).as("min_ok"),
        max(col("o_orderkey")).as("max_ok"))
      .orderBy(col("flag"))
  }

  private val q192Sql =
    """SELECT o_orderstatus AS flag, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
      |FROM orders
      |WHERE o_orderkey <= 15000 AND o_orderkey % 10 <> 1
      |GROUP BY 1 ORDER BY flag""".stripMargin

  // -------------------------------------------------------- q193_clone
  // DEEP CLONE end to end: the q192 lake (created + appended +
  // overwritten through the batch provider) is cloned by CALL
  // graft_clone — a distributed byte copy of the snapshot's files,
  // staged and published by one rename — and the serving aggregate
  // reads the CLONE. The oracle is the same post-overwrite recomputation
  // from raw orders, so the hash-match proves the copy byte-true: any
  // lost file, row, or mangled value would shift the hash. Independence
  // (either side's writes/vacuum never touch the other) and the
  // branch-source / DV-travel cases are pinned in CloneSpec.
  private val q193Clones = scala.collection.concurrent.TrieMap[String, String]()
  private def q193Clone(s: SparkSession, d: String): DataFrame = {
    val dst = q193Clones.getOrElseUpdate(d, {
      val src = q192Lake(s, d)
      val work = java.nio.file.Files.createTempDirectory("graft_q193_")
      val c = s"$work/clone"
      s.sql(s"CALL graft_clone('$src', '$c')").collect()
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      c
    })
    s.read.format("graft-lake").load(dst)
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        min(col("o_orderkey")).as("min_ok"),
        max(col("o_orderkey")).as("max_ok"))
      .orderBy(col("flag"))
  }

  // ------------------------------------------------ q196_branch_merge
  // BRANCH MERGE UNDER DIVERGENCE end to end — the live-table promote
  // loop fastForward alone cannot close: an orders lake forks a branch,
  // then BOTH sides commit (main appends its flag='O' slice — a live
  // table never freezes; the branch COW-DELETEs inside flag='F' and
  // appends its own flag='F' slice), so the histories genuinely
  // diverge. CALL graft_branch_merge rebases the branch's post-fork
  // delta onto the advanced main head (commit-level partition conflict
  // units — the two sides' rewrites are disjoint by partition, the
  // merge is legal) and fast-forwards. The serving aggregate reads
  // MAIN after the merge; the DuckDB oracle recomputes the merged
  // state from raw orders, so the hash-match proves the rebase lost no
  // side's rows, applied the branch delete exactly once, and the
  // adoption published atomically. True conflicts and the randomized
  // interleave property are pinned in RebaseSpec. At 100 TB the rebase
  // is metadata-plane file-list algebra plus a churn-sized manifest
  // merge — work proportional to the BRANCH's churn, never the table.
  private val q196Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q196Lake(s: SparkSession, d: String): String =
    q196Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q196_")
      val lake = s"$work/lake"
      val ords = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
      ords.filter(col("o_orderkey") <= 20000)
        .write.partitionBy("flag").parquet(lake)
      graft.sources.CommitLog.init(s, lake)
      s.sql(s"CALL graft_branch('$lake', 'exp')")
      // main advances past the fork: its own append (flag='O' slice)
      graft.sources.CommitLog.append(s,
        ords.filter(col("o_orderkey") > 20000 &&
          col("o_orderkey") <= 25000 && col("flag") === "O"), lake)
      // the branch diverges: a COW delete confined to flag='F', then
      // its own append of the flag='F' slice
      s.sql(
        s"DELETE FROM graft_lake('$lake@exp') " +
          "WHERE flag = 'F' AND o_orderkey % 10 = 3")
      graft.sources.CommitLog.append(s,
        ords.filter(col("o_orderkey") > 20000 &&
          col("o_orderkey") <= 25000 && col("flag") === "F"),
        s"$lake@exp")
      // merge: rebase the branch onto the advanced head, then adopt
      s.sql(s"CALL graft_branch_merge('$lake', 'exp')").collect()
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q196BranchMerge(s: SparkSession, d: String): DataFrame = {
    val lake = q196Lake(s, d)
    s.sql(
      s"""SELECT flag, count(*) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_price,
         |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
         |FROM graft_lake('$lake')
         |GROUP BY flag ORDER BY flag""".stripMargin)
  }

  private val q196Sql =
    """SELECT o_orderstatus AS flag, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
      |FROM orders
      |WHERE (o_orderkey <= 20000
      |        AND NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 3))
      |   OR (o_orderkey > 20000 AND o_orderkey <= 25000
      |        AND o_orderstatus IN ('F', 'O'))
      |GROUP BY 1 ORDER BY flag""".stripMargin

  // -------------------------------------------------- q198_txn_append
  // MULTI-TABLE ATOMIC WRITE end to end (LakeTxn.appendAll): a dim+fact
  // family (orders + lineitem lakes) takes ONE transactional dual
  // append — including the worst crash window, exercised for real: a
  // "crashed first attempt" commits the ORDERS slice only (no
  // manifest), the fixture PROVES family readers still see the old cut
  // (torn-pair invisibility), then the replayed appendAll heals
  // forward — orders no-ops through its ledger, lineitem commits, one
  // manifest pins both. The serving aggregate joins the two tables
  // THROUGH the manifest (LakeTxn.read both sides); the DuckDB oracle
  // recomputes from raw tables, so the hash-match proves exactly-once
  // across the crash + replay. This is the reference's one-Postgres-
  // transaction property (clean_data.py:176-210) completed for WRITES;
  // the read side was q141's territory. At 100 TB the verb is two
  // O(batch) appends plus a kilobyte manifest CAS.
  // The shared txnFamilyFixture scaffold lives in [[QueryFixtures]]
  // (round-15 verdict readability item): one copy of the crash-window
  // contract, four verb surfaces exercised against it (q198/q200/q201
  // via Scala writeAll, q202 via the SQL CALL).
  private val q198Families = scala.collection.concurrent.TrieMap[String, (String, String, String)]()
  private def q198Family(s: SparkSession, d: String): (String, String, String) =
    QueryFixtures.txnFamilyFixture(q198Families, "q198", s, d,
      cutOrders = true) { f =>
      graft.sources.CommitLog.append(f.s, f.oSlice, f.oLake,
        txn = Some((f.appId, 42L)))
    } { f =>
      val midWindow = graft.sources.LakeTxn.read(f.s, f.txn, f.oLake).count()
      require(midWindow == graft.sources.CommitLog
        .readAt(f.s, f.oLake, 1L).count(),
        s"manifest reader saw the torn pair: $midWindow rows")
    } { f =>
      graft.sources.LakeTxn.writeAll(f.s, f.txn, Seq(
        graft.sources.LakeTxn.TxnAppend(f.oLake, f.oSlice),
        graft.sources.LakeTxn.TxnAppend(f.lLake, f.lSlice)),
        batchId = 42L)
      ()
    }

  private def q198TxnAppend(s: SparkSession, d: String): DataFrame = {
    val (oLake, lLake, txn) = q198Family(s, d)
    val o = graft.sources.LakeTxn.read(s, txn, oLake)
    val l = graft.sources.LakeTxn.read(s, txn, lLake)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("lflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        min(col("o_orderkey")).as("min_ok"),
        max(col("o_orderkey")).as("max_ok"))
      .orderBy(col("lflag"))
  }

  private val q198Sql =
    """SELECT l_returnflag AS lflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_qty,
      |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY lflag""".stripMargin

  // ---------------------------------------------- q205_txn_time_travel
  // FAMILY TIME TRAVEL under the vacuum contract, end to end: q198's
  // healed family holds two cuts — t1 pins both participants' BASE
  // slices (keys <= max/2), t2 the post-transaction state. This query
  // first runs a PLAIN CommitLog.vacuum(keepLast=1) on both
  // participants — the operator who has never heard of families — and
  // then serves the join AT THE HISTORICAL CUT through LakeTxn.readAt.
  // The DuckDB oracle recomputes t1's state from the raw tables with
  // the same scale-driven cut (max//2 — integer division on both
  // engines), so the hash-match proves two things at once every round:
  // retained manifests' pins are ENFORCED pin sources inside vacuum
  // itself (the r16 mechanism — the historical versions survive the
  // wrapper-less vacuum), and a family cut is reproducible EXACTLY:
  // last cut's (orders, lineitem) pair, not just the latest one. At
  // 100 TB: readAt is one manifest read + two pinned snapshot reads;
  // retention stays operator-tunable per family (vacuumManifests)
  // without any per-table bookkeeping.
  private def q205TimeTravel(s: SparkSession, d: String): DataFrame = {
    val (oLake, lLake, txn) = q198Family(s, d)
    graft.sources.CommitLog.vacuum(s, oLake, keepLast = 1,
      staleStagingMs = 0)
    graft.sources.CommitLog.vacuum(s, lLake, keepLast = 1,
      staleStagingMs = 0)
    val o = graft.sources.LakeTxn.readAt(s, txn, 1L, oLake)
    val l = graft.sources.LakeTxn.readAt(s, txn, 1L, lLake)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("lflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        min(col("o_orderkey")).as("min_ok"),
        max(col("o_orderkey")).as("max_ok"))
      .orderBy(col("lflag"))
  }

  private val q205Sql =
    """SELECT l_returnflag AS lflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_qty,
      |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderkey <= (SELECT max(o_orderkey)//2 FROM orders)
      |  AND l_orderkey <= (SELECT max(l_orderkey)//2 FROM lineitem)
      |GROUP BY 1 ORDER BY lflag""".stripMargin

  // -------------------------------------------------- q200_txn_delete
  // THE COMPLIANCE SHAPE as one transaction (LakeTxn.writeAll with a
  // TxnDelete leg): new lineitem facts append WHILE expired orders
  // (status 'F') purge, atomically — previously two commits with a
  // torn window where a family reader could see the purge without the
  // facts (or vice versa). The worst crash window runs FOR REAL: a
  // "crashed first attempt" commits the orders DELETE only (no
  // manifest) — the fixture proves family readers still see the
  // un-purged cut — then the replayed writeAll heals forward (delete
  // no-ops through the per-table ledger, lineitem commits, one
  // manifest pins both) and a second replay is a full no-op. The
  // serving aggregate joins both tables THROUGH the manifest; the
  // DuckDB oracle recomputes the post-transaction state from the raw
  // tables (join minus status-F orders), so the hash-match proves the
  // purge+append landed exactly once. At 100 TB: the delete is a
  // copy-on-write of the HIT files only, the append O(batch), the
  // manifest a kilobyte CAS.
  private val q200Families = scala.collection.concurrent.TrieMap[String, (String, String, String)]()
  private def q200Family(s: SparkSession, d: String): (String, String, String) =
    QueryFixtures.txnFamilyFixture(q200Families, "q200", s, d,
      cutOrders = false) { f =>
      graft.sources.CommitLog.delete(f.s, f.oLake, col("flag") === "F",
        txn = Some((f.appId, 7L)))
    } { f =>
      val midWindow = graft.sources.LakeTxn.read(f.s, f.txn, f.oLake).count()
      require(midWindow == graft.sources.CommitLog
        .readAt(f.s, f.oLake, 1L).count(),
        s"manifest reader saw the torn purge: $midWindow rows")
    } { f =>
      graft.sources.LakeTxn.writeAll(f.s, f.txn, Seq(
        graft.sources.LakeTxn.TxnDelete(f.oLake, col("flag") === "F"),
        graft.sources.LakeTxn.TxnAppend(f.lLake, f.lSlice)),
        batchId = 7L)
      ()
    }

  private def q200TxnDelete(s: SparkSession, d: String): DataFrame = {
    val (oLake, lLake, txn) = q200Family(s, d)
    val o = graft.sources.LakeTxn.read(s, txn, oLake)
    val l = graft.sources.LakeTxn.read(s, txn, lLake)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("lflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        min(col("o_orderkey")).as("min_ok"),
        max(col("o_orderkey")).as("max_ok"))
      .orderBy(col("lflag"))
  }

  private val q200Sql =
    """SELECT l_returnflag AS lflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_qty,
      |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderstatus <> 'F'
      |GROUP BY 1 ORDER BY lflag""".stripMargin

  // ------------------------------------------------ q201_txn_restate
  // THE RESTATEMENT SHAPE as one transaction (writeAll's
  // TxnReplaceWhere leg): partition 'P' of the orders lake is restated
  // (every P row's price corrected by +1,000,000 — an exact double op
  // both engines compute bit-identically) WHILE the lineitem facts
  // append, atomically. Crash window exercised for real: the
  // replaceWhere leg committed under the family identity, the fact
  // append and manifest never happened — family readers still see the
  // UN-restated cut; the replayed writeAll heals forward (restatement
  // no-ops via the per-table ledger, facts commit, one manifest pins
  // both). Oracle recomputes the post-transaction join from raw
  // tables with the restatement as a CASE — the hash-match proves the
  // restate+append landed exactly once. At 100 TB the replaceWhere is
  // copy-on-write of the HIT partition only (here: the P files).
  private val q201Families = scala.collection.concurrent.TrieMap[String, (String, String, String)]()
  private def q201Restated(f: QueryFixtures.TxnFix): DataFrame =
    f.ords.filter(col("flag") === "P")
      .withColumn("o_totalprice", col("o_totalprice") + 1000000.0)
  private def q201Family(s: SparkSession, d: String): (String, String, String) =
    QueryFixtures.txnFamilyFixture(q201Families, "q201", s, d,
      cutOrders = false) { f =>
      graft.sources.CommitLog.replaceWhere(f.s, f.oLake,
        col("flag") === "P", q201Restated(f),
        txn = Some((f.appId, 5L)))
    } { f =>
      val midWindow = graft.sources.LakeTxn.read(f.s, f.txn, f.oLake)
        .agg(max(col("o_totalprice"))).head.getDouble(0)
      require(midWindow < 1000000.0,
        s"manifest reader saw the torn restatement: max price $midWindow")
    } { f =>
      graft.sources.LakeTxn.writeAll(f.s, f.txn, Seq(
        graft.sources.LakeTxn.TxnReplaceWhere(f.oLake,
          col("flag") === "P", q201Restated(f)),
        graft.sources.LakeTxn.TxnAppend(f.lLake, f.lSlice)),
        batchId = 5L)
      ()
    }

  private def q201TxnRestate(s: SparkSession, d: String): DataFrame = {
    val (oLake, lLake, txn) = q201Family(s, d)
    val o = graft.sources.LakeTxn.read(s, txn, oLake)
    val l = graft.sources.LakeTxn.read(s, txn, lLake)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("lflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        min(col("o_orderkey")).as("min_ok"),
        max(col("o_orderkey")).as("max_ok"))
      .orderBy(col("lflag"))
  }

  private val q201Sql =
    """WITH o AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderstatus = 'P'
      |      THEN o_totalprice + 1000000.0 ELSE o_totalprice
      |    END AS o_totalprice
      |  FROM orders)
      |SELECT l_returnflag AS lflag, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
      |FROM lineitem JOIN o ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY lflag""".stripMargin

  // ----------------------------------------------------- q202_txn_sql
  // THE COMPLIANCE TRANSACTION THROUGH PURE SQL: q200's purge shape
  // (fact append + retention delete, one family cut) driven end to end
  // from the SQL front door — `CALL graft_txn_write` composes the
  // staged verbs over a temp view, `graft_txn_read` serves the pinned
  // cut — so a SQL-only operator can run the engine's flagship
  // consistency verb without touching Scala (the round-15 verdict's
  // parity gap: the READ side already spoke SQL, the write side was
  // Scala-only). The fixture runs the same REAL crash window as q200
  // (the orders delete committed under the family identity, no
  // manifest), heals forward by REPLAYING THE SAME CALL, and replays
  // once more — proving the SQL verb rides the identical ledger-based
  // exactly-once machinery. Shares q200's oracle pattern verbatim: the
  // DuckDB recomputation of the post-transaction join hash-matches.
  private val q202Families = scala.collection.concurrent.TrieMap[String, (String, String, String)]()
  private def q202Family(s: SparkSession, d: String): (String, String, String) =
    QueryFixtures.txnFamilyFixture(q202Families, "q202", s, d,
      cutOrders = false) { f =>
      graft.sources.CommitLog.delete(f.s, f.oLake, col("flag") === "F",
        txn = Some((f.appId, 7L)))
    } { f =>
      val midWindow = graft.sources.LakeTxn.read(f.s, f.txn, f.oLake).count()
      require(midWindow == graft.sources.CommitLog
        .readAt(f.s, f.oLake, 1L).count(),
        s"manifest reader saw the torn purge: $midWindow rows")
    } { f =>
      f.lSlice.createOrReplaceTempView("q202_staged_lineitem")
      f.s.sql(s"CALL graft_txn_write('${f.txn}', 7, " +
        s""""delete|${f.oLake}|flag = 'F'", """ +
        s"'append|${f.lLake}|q202_staged_lineitem')")
      ()
    }

  private def q202TxnSql(s: SparkSession, d: String): DataFrame = {
    val (oLake, lLake, txn) = q202Family(s, d)
    s.sql(
      s"""SELECT lflag, count(*) AS n,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_qty,
         |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
         |FROM graft_txn_read('$txn', '$lLake') l
         |JOIN graft_txn_read('$txn', '$oLake') o
         |  ON l.l_orderkey = o.o_orderkey
         |GROUP BY lflag ORDER BY lflag""".stripMargin)
  }

  // --------------------------------------------------- q206_txn_changes
  // CUT-TO-CUT CDC THROUGH THE MANIFEST: "what did the compliance
  // transaction change in orders?" answered as a keyed change feed
  // BETWEEN FAMILY CUTS (LakeTxn.changesBetween → the graft_txn_changes
  // TVF) — the diff twin of q205's readAt time travel. The q200 family
  // holds cut t1 (pre-purge) and t2 (post purge+append); diffing the
  // orders participant t1→t2 yields exactly the purged status-F rows as
  // `delete` pre-images, which the DuckDB oracle recomputes from the
  // raw table (WHERE o_orderstatus = 'F') — the hash-match proves the
  // feed is precisely the transaction's effect, nothing more, nothing
  // missed. A participant whose pin didn't move diffs to an EMPTY feed
  // (pinned in LakeTxnSpec). At 100 TB: resolves two kilobyte
  // manifests, then reads only the commits' touched partitions at two
  // pinned versions — churn-sized, never the lake.
  private def q206TxnChanges(s: SparkSession, d: String): DataFrame = {
    val (oLake, _, txn) = q200Family(s, d)
    s.sql(
      s"""SELECT _change_type AS change, flag, count(*) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_price,
         |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
         |FROM graft_txn_changes('$txn', 1, 2, '$oLake', 'o_orderkey')
         |GROUP BY 1, 2 ORDER BY change, flag""".stripMargin)
  }

  private val q206Sql =
    """SELECT 'delete' AS change, o_orderstatus AS flag, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
      |FROM orders WHERE o_orderstatus = 'F'
      |GROUP BY 2 ORDER BY change, flag""".stripMargin

  // ------------------------------------------------------- q181_zorder
  // Z-order clustering end-to-end: a lineitem slice is rewritten by
  // CALL graft_compact_zorder on (l_partkey, l_suppkey), then served
  // through scanBox — a two-column box predicate answered from the
  // metadata-plane min/max manifest, reading only the files whose
  // hyper-rectangle intersects the box. The DuckDB oracle runs the same
  // predicate over raw lineitem, so the hash-match proves the
  // interleaved rewrite preserved every row and the pruned scan reads
  // exactly the predicate's rows (the pruning RATIO itself is pinned in
  // ZorderSpec where the geometry is controlled).
  private def q181Zorder(s: SparkSession, d: String): DataFrame = {
    val lake = QueryFixtures.q181Lake(s, d)
    val (df, (survivors, total)) = graft.sources.CommitLog.scanBox(s, lake,
      Seq(("l_partkey", 100L, 300L), ("l_suppkey", 10L, 40L)))
    System.err.println(s"[zorder] q181 scanBox read $survivors/$total files")
    df.agg(count(lit(1)).as("n"),
      sum(col("l_quantity").cast("decimal(18,2)"))
        .cast("double").as("sum_qty"),
      sum(col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double").as("sum_price"))
  }

  private val q181Sql =
    """SELECT count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price
      |FROM lineitem
      |WHERE l_orderkey <= 30000
      |  AND l_partkey BETWEEN 100 AND 300
      |  AND l_suppkey BETWEEN 10 AND 40""".stripMargin

  // ---------------------------------------------------- q183_sql_ddl
  // Schema DDL end-to-end: ALTER TABLE ... ADD COLUMNS declares a new
  // nullable column as a ZERO-FILE metadata commit, existing rows read
  // it as null, and a positional INSERT then carries it. Round-11 adds
  // the rest of the DDL family: RENAME COLUMN (metadata-only — data
  // files keep the birth name, reads alias, a post-rename UPDATE
  // mutates through the new name) and DROP COLUMN (logical removal).
  // The DuckDB oracle recomputes the evolved union (base rows with a
  // NULL renamed column, inserted rows with the computed-then-updated
  // one, the dropped column absent), so the hash-match proves the
  // schema commits, the null back-fill, the physical-name mapping on
  // both the read and write paths, and the retirement of dropped bytes.
  private val q183Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q183Lake(s: SparkSession, d: String): String =
    q183Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q183_")
      val lake = s"$work/lake"
      Tables.orders(s, d).filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.parquet(lake)
      graft.sources.CommitLog.init(s, lake)
      s.sql(s"ALTER TABLE graft_lake('$lake') ADD COLUMNS (o_bonus DOUBLE)")
      Tables.orders(s, d).filter(col("o_orderkey") <= 1000)
        .createOrReplaceTempView("q183_src")
      s.sql(
        s"""INSERT INTO graft_lake('$lake')
           |SELECT o_orderkey + 1000000, o_custkey, o_totalprice,
           |       o_totalprice * 2 + 0.25
           |FROM q183_src""".stripMargin)
      s.sql(s"ALTER TABLE graft_lake('$lake') " +
        "RENAME COLUMN o_bonus TO o_extra")
      // >= : the generator emits an o_orderkey = 0 row, which inserts
      // as key 1000000 exactly
      s.sql(s"UPDATE graft_lake('$lake') SET o_extra = o_extra + 1 " +
        "WHERE o_orderkey >= 1000000")
      s.sql(s"ALTER TABLE graft_lake('$lake') DROP COLUMN o_custkey")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q183SqlDdl(s: SparkSession, d: String): DataFrame = {
    val lake = q183Lake(s, d)
    s.sql(
      s"""SELECT count(*) AS n, count(o_extra) AS n_extra,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_price,
         |  CAST(sum(CAST(o_extra AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_extra
         |FROM graft_lake('$lake')""".stripMargin)
  }

  private val q183Sql =
    """WITH t AS (
      |  SELECT o_orderkey AS k, o_totalprice AS p,
      |         CAST(NULL AS DOUBLE) AS extra
      |  FROM orders WHERE o_orderkey <= 20000
      |  UNION ALL
      |  SELECT o_orderkey + 1000000, o_totalprice,
      |         o_totalprice * 2 + 0.25 + 1
      |  FROM orders WHERE o_orderkey <= 1000)
      |SELECT count(*) AS n, count(extra) AS n_extra,
      |  CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  CAST(sum(CAST(extra AS DECIMAL(18,2))) AS DOUBLE) AS sum_extra
      |FROM t""".stripMargin

  // ---------------------------------------------------- q184_catalog
  // The DataSourceV2 TableCatalog end-to-end (catalog.GraftCatalog +
  // ResolveGraftCatalogOps): EVERY verb in this lifecycle is issued as
  // SQL over CATALOG-QUALIFIED NAMES — CREATE NAMESPACE, CREATE TABLE
  // (with PARTITIONED BY and a graft.statscols property), INSERT INTO
  // (SELECT and VALUES forms), UPDATE, DELETE, a column-level MERGE —
  // and the serving read is a plain name, no graft_lake() TVF anywhere.
  // The DuckDB oracle recomputes the same algebra from raw orders, so
  // the hash-match proves the whole catalog plane: name→lake mapping,
  // the relation swap (scan = the CommitLog snapshot plan), the v2
  // write interception, and parser routing for catalog-name DML.
  private val q184Tables = scala.collection.concurrent.TrieMap[String, String]()
  private def q184Table(s: SparkSession, d: String): String =
    q184Tables.getOrElseUpdate(d, {
      // one warehouse per session — the CatalogManager caches the
      // plugin instance per name, so the conf must not change after
      // first use; per-sfDir isolation comes from the table name
      if (s.conf.getOption("spark.sql.catalog.gq184").isEmpty) {
        val wh = java.nio.file.Files.createTempDirectory("graft_q184_wh_")
        s.conf.set("spark.sql.catalog.gq184",
          classOf[graft.catalog.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.gq184.warehouse", wh.toString)
        sys.addShutdownHook {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(wh.toFile)
        }
      }
      if (s.sql("SHOW NAMESPACES IN gq184").filter(col("namespace") === "db")
          .isEmpty) s.sql("CREATE NAMESPACE gq184.db")
      val tag = Integer.toHexString(d.hashCode).takeWhile(_ != '-')
      val t = s"gq184.db.orders_$tag"
      s.sql(s"CREATE TABLE $t (o_orderkey BIGINT, o_custkey BIGINT, " +
        "o_totalprice DOUBLE, flag STRING) PARTITIONED BY (flag) " +
        "TBLPROPERTIES ('graft.statscols' = 'o_orderkey')")
      Tables.orders(s, d).filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
        .createOrReplaceTempView("q184_src")
      s.sql(s"INSERT INTO $t SELECT o_orderkey, o_custkey, " +
        "o_totalprice, flag FROM q184_src")
      s.sql(s"UPDATE $t SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderkey <= 5000")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 3")
      s.sql(
        s"""MERGE INTO $t AS tt
           |USING (SELECT o_orderkey, flag, o_totalprice * 0.5 AS delta
           |       FROM q184_src WHERE o_orderkey > 18000) AS s
           |ON tt.o_orderkey = s.o_orderkey
           |WHEN MATCHED THEN UPDATE SET
           |  o_totalprice = tt.o_totalprice + s.delta
           |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey,
           |  o_totalprice, flag) VALUES (s.o_orderkey, -1L, s.delta,
           |  s.flag)""".stripMargin)
      s.sql(s"INSERT INTO $t VALUES (9999991L, 5L, 100.5, 'F')")
      t
    })

  private def q184Catalog(s: SparkSession, d: String): DataFrame = {
    val t = q184Table(s, d)
    s.sql(
      s"""SELECT flag, count(*) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_price,
         |  min(o_orderkey) AS min_ok, min(o_custkey) AS min_ck
         |FROM $t GROUP BY flag ORDER BY flag""".stripMargin)
  }

  private val q184Sql =
    """WITH t0 AS (
      |  SELECT o_orderkey AS k, o_custkey AS c, o_totalprice AS p,
      |         o_orderstatus AS f
      |  FROM orders WHERE o_orderkey <= 20000),
      |t1 AS (
      |  SELECT k, c, CASE WHEN k <= 5000 THEN p * 2 ELSE p END AS p, f
      |  FROM t0),
      |t2 AS (SELECT * FROM t1 WHERE c % 10 <> 3),
      |s2 AS (SELECT k, f, p * 0.5 AS delta FROM t0 WHERE k > 18000),
      |t3 AS (
      |  SELECT t2.k, t2.c,
      |         t2.p + CASE WHEN s2.k IS NOT NULL THEN s2.delta
      |                     ELSE 0 END AS p,
      |         t2.f
      |  FROM t2 LEFT JOIN s2 ON t2.k = s2.k
      |  UNION ALL
      |  SELECT s2.k, -1, s2.delta, s2.f
      |  FROM s2 LEFT JOIN t2 ON s2.k = t2.k WHERE t2.k IS NULL),
      |t4 AS (SELECT * FROM t3
      |       UNION ALL SELECT 9999991, 5, 100.5, 'F')
      |SELECT f AS flag, count(*) AS n,
      |  CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  min(k) AS min_ok, min(c) AS min_ck
      |FROM t4 GROUP BY 1 ORDER BY flag""".stripMargin

  // ----------------------------------------------- q185_catalog_write
  // The catalog WRITE surface beyond plain INSERT INTO: CTAS with
  // PARTITIONED BY (create + append in one statement), full-snapshot
  // INSERT OVERWRITE (CommitLog.overwrite through the v2 interception),
  // and DYNAMIC PARTITION OVERWRITE (OverwritePartitionsDynamic →
  // CommitLog.replacePartitions: only the partitions present in the
  // data are replaced; every other partition's files are untouched).
  // The DuckDB oracle recomputes the three-step algebra from raw
  // orders, so the hash-match proves the v2 write plans land the right
  // commit verbs with the right granularity.
  private val q185Tables = scala.collection.concurrent.TrieMap[String, String]()
  private def q185Table(s: SparkSession, d: String): String =
    q185Tables.getOrElseUpdate(d, {
      if (s.conf.getOption("spark.sql.catalog.gq184").isEmpty) {
        val wh = java.nio.file.Files.createTempDirectory("graft_q184_wh_")
        s.conf.set("spark.sql.catalog.gq184",
          classOf[graft.catalog.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.gq184.warehouse", wh.toString)
        sys.addShutdownHook {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(wh.toFile)
        }
      }
      if (s.sql("SHOW NAMESPACES IN gq184").filter(col("namespace") === "db")
          .isEmpty) s.sql("CREATE NAMESPACE gq184.db")
      val tag = Integer.toHexString(d.hashCode).takeWhile(_ != '-')
      val t = s"gq184.db.ow_$tag"
      Tables.orders(s, d).filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"),
          concat(lit("b"), col("o_orderkey") % 3).as("b"))
        .createOrReplaceTempView("q185_src")
      // 1. CTAS with TWO-LEVEL hive partitioning (flag, b) — the
      // reference's own layout is two-level (equip/date)
      s.sql(s"CREATE TABLE $t PARTITIONED BY (flag, b) AS " +
        "SELECT o_orderkey, o_totalprice, flag, b FROM q185_src")
      // 2. full INSERT OVERWRITE: the snapshot becomes exactly this
      s.sql(s"INSERT OVERWRITE $t SELECT o_orderkey, o_totalprice * 2, " +
        "flag, b FROM q185_src WHERE o_orderkey <= 15000")
      // 3. dynamic partition overwrite: ONLY the (flag='F', b='b0')
      // TUPLE is replaced — every other nested partition (including
      // flag='F' with other b values) survives byte-identically
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try s.sql(s"INSERT OVERWRITE $t SELECT o_orderkey, " +
        "o_totalprice + 1000.5, flag, b FROM q185_src " +
        "WHERE flag = 'F' AND b = 'b0' AND o_orderkey <= 5000")
      finally s.conf.set("spark.sql.sources.partitionOverwriteMode",
        "static")
      t
    })

  private def q185CatalogWrite(s: SparkSession, d: String): DataFrame = {
    val t = q185Table(s, d)
    s.sql(
      s"""SELECT flag, b, count(*) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_price,
         |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
         |FROM $t GROUP BY flag, b ORDER BY flag, b""".stripMargin)
  }

  private val q185Sql =
    """WITH src AS (
      |  SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS f,
      |    'b' || CAST(o_orderkey % 3 AS VARCHAR) AS b
      |  FROM orders WHERE o_orderkey <= 20000),
      |t2 AS (SELECT k, p * 2 AS p, f, b FROM src WHERE k <= 15000),
      |t3 AS (
      |  SELECT k, p + 1000.5 AS p, f, b FROM src
      |  WHERE f = 'F' AND b = 'b0' AND k <= 5000
      |  UNION ALL
      |  SELECT * FROM t2 WHERE NOT (f = 'F' AND b = 'b0'))
      |SELECT f AS flag, b, count(*) AS n,
      |  CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  min(k) AS min_ok, max(k) AS max_ok
      |FROM t3 GROUP BY 1, 2 ORDER BY flag, b""".stripMargin

  // ------------------------------------------------------ q186_widen
  // TYPE WIDENING end-to-end: the fixture commits an INT column and a
  // DECIMAL(10,2) column, widens them with zero-file ALTER COLUMN TYPE
  // commits — int→bigint, then bigint→DECIMAL(20,0) and
  // decimal(10,2)→DECIMAL(14,2) (the round-12 decimal lattice edges) —
  // then inserts values only the wide types can hold. The serving
  // aggregate reads old (narrow-stored, scan-upcast) and new
  // (wide-stored) files under one committed schema; the DuckDB oracle
  // recomputes the union, so the hash-match proves every upcast is
  // value-exact and the DDL routed through the parser and commit log.
  private val q186Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q186Lake(s: SparkSession, d: String): String =
    q186Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q186_")
      val lake = s"$work/lake"
      Tables.orders(s, d).filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"),
          col("o_custkey").cast("int").as("ck"),
          col("o_totalprice").cast("decimal(10,2)").as("amt"),
          col("o_orderstatus").as("flag"))
        .write.partitionBy("flag").parquet(lake)
      graft.sources.CommitLog.init(s, lake)
      s.sql(s"ALTER TABLE graft_lake('$lake') ALTER COLUMN ck TYPE BIGINT")
      s.sql(s"ALTER TABLE graft_lake('$lake') ALTER COLUMN ck " +
        "TYPE DECIMAL(20,0)")
      s.sql(s"ALTER TABLE graft_lake('$lake') ALTER COLUMN amt " +
        "TYPE DECIMAL(14,2)")
      s.sql(s"INSERT INTO graft_lake('$lake') VALUES " +
        "(9999991, 8000000000, 123456789012.34, 'F')")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q186Widen(s: SparkSession, d: String): DataFrame = {
    val lake = q186Lake(s, d)
    s.sql(
      s"""SELECT flag, count(*) AS n,
         |  CAST(sum(ck) AS BIGINT) AS sum_ck,
         |  CAST(max(ck) AS BIGINT) AS max_ck,
         |  CAST(sum(amt) AS DOUBLE) AS sum_amt,
         |  CAST(max(amt) AS DOUBLE) AS max_amt
         |FROM graft_lake('$lake')
         |GROUP BY flag ORDER BY flag""".stripMargin)
  }

  private val q186Sql =
    """WITH t AS (
      |  SELECT o_custkey AS ck,
      |    CAST(o_totalprice AS DECIMAL(10,2)) AS amt, o_orderstatus AS f
      |  FROM orders WHERE o_orderkey <= 20000
      |  UNION ALL
      |  SELECT 8000000000, CAST(123456789012.34 AS DECIMAL(14,2)), 'F')
      |SELECT f AS flag, count(*) AS n,
      |  CAST(sum(ck) AS BIGINT) AS sum_ck,
      |  CAST(max(ck) AS BIGINT) AS max_ck,
      |  CAST(sum(amt) AS DOUBLE) AS sum_amt,
      |  CAST(max(amt) AS DOUBLE) AS max_amt
      |FROM t GROUP BY 1 ORDER BY flag""".stripMargin

  // ------------------------------------------------- q175_meta_distinct
  // Metadata-plane COUNT(DISTINCT): per-file theta sketches ride the
  // commit (thetaCols at init), so distinct counts — the third
  // aggregate class beside count/min/max and quantiles — merge from
  // the kilobyte manifest with zero data files opened, globally or per
  // partition. Below the 2^lgK nominal the theta sketch is in EXACT
  // mode (deterministic integers), so the DuckDB oracle runs the real
  // COUNT(DISTINCT) and the hash must match. Two-commit fixture (init +
  // upsert) pins post-upsert freshness of the sketch manifest.
  private val q175Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q175Lake(s: SparkSession, d: String): String =
    q175Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q175_")
      val lake = s"$work/lake"
      val ords = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
      val k = Tables.orders(s, d).agg(max(col("o_orderkey"))).head.getLong(0)
      ords.filter(col("o_orderkey") <= k / 2)
        .write.partitionBy("flag").parquet(lake)
      graft.sources.CommitLog.init(s, lake,
        statsCols = Seq("o_orderkey"),
        thetaCols = Seq("o_custkey", "o_orderkey"), thetaLgK = 21)
      graft.sources.CommitLog.upsert(s,
        ords.filter(col("o_orderkey") > k / 2), lake,
        Seq("o_orderkey"), "flag")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q175MetaDistinct(s: SparkSession, d: String): DataFrame =
    graft.sources.CommitLog.distinctAggByPartition(s, q175Lake(s, d),
        Seq("o_custkey", "o_orderkey"))
      .select(col("flag"),
        col("distinct_o_custkey").as("n_cust"),
        col("distinct_o_orderkey").as("n_keys"))
      .orderBy(col("flag"))

  private val q175Sql =
    """SELECT o_orderstatus AS flag,
      |  count(DISTINCT o_custkey) AS n_cust,
      |  count(DISTINCT o_orderkey) AS n_keys
      |FROM orders
      |GROUP BY 1 ORDER BY flag""".stripMargin

  // ------------------------------------------------------ q166_restore
  // Version rollback as an operational verb (CommitLog.restore): the
  // fixture seeds a status-partitioned orders slice, publishes a BAD
  // ingest (every price in one partition multiplied by 1000, a new
  // column tagged on), then RESTOREs to the pre-ingest version — one
  // version-file commit, zero data movement, history append-only (the
  // bad version stays time-travelable until vacuum). The DuckDB oracle
  // aggregates the ORIGINAL slice, so the hash-match proves the
  // rollback reproduced version 1 exactly — including that the additive
  // schema evolution did NOT resurrect (the restored rows read the
  // tagged column as null, counted in the output as zero). The ledger
  // survival and vacuum refusal are pinned in CommitLogSpec.
  private val q166Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q166Lake(s: SparkSession, d: String): String =
    q166Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q166_")
      val lake = s"$work/lake"
      val ords = Tables.orders(s, d).filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
      ords.write.partitionBy("flag").parquet(lake)
      val v1 = graft.sources.CommitLog.init(s, lake).version
      // the bad ingest: corrupted prices plus an evolved column
      graft.sources.CommitLog.upsert(s,
        ords.filter(col("flag") === "F")
          .withColumn("o_totalprice", col("o_totalprice") * 1000)
          .withColumn("ingest_tag", lit("batch_bad")),
        lake, Seq("o_orderkey"), "flag")
      graft.sources.CommitLog.restore(s, lake, v1)
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  private def q166Restore(s: SparkSession, d: String): DataFrame =
    graft.sources.CommitLog.read(s, q166Lake(s, d))
      .groupBy(col("flag")).agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        sum(when(col("ingest_tag").isNotNull, 1L).otherwise(0L))
          .as("n_tagged"))
      .orderBy(col("flag"))

  private val q166Sql =
    """SELECT o_orderstatus AS flag, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  CAST(0 AS BIGINT) AS n_tagged
      |FROM orders
      |WHERE o_orderkey <= 20000
      |GROUP BY 1 ORDER BY flag""".stripMargin

  // --------------------------------------------------- q151_join_elim
  // Constraint-informed join elimination (graft.plans.EliminateRiDimJoin):
  // the canonical BI shape — fact joined to a dimension, aggregated by the
  // join key alone. customer.c_nationkey is declared (audited in
  // RiJoinElimSpec) to reference the unique nation.n_nationkey, so the
  // optimizer deletes the join outright: no broadcast build, no probe,
  // and nation.parquet is never opened. The DuckDB oracle EXECUTES the
  // join — hash-matching it is the soundness proof that the fold is an
  // identity on RI-holding data. Join-freedom is pinned in PlanAuditSpec.
  private def q151JoinElim(s: SparkSession, d: String): DataFrame = {
    graft.plans.ConstraintCatalog.declareUnique(
      s"$d/nation.parquet", "n_nationkey")
    graft.plans.ConstraintCatalog.declareForeignKey(
      s"$d/customer.parquet", "c_nationkey",
      s"$d/nation.parquet", "n_nationkey")
    Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey"))
      .agg(
        count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          .as("sum_bal"))
      .select(col("n_nationkey").as("nk"), col("n_cust"), col("sum_bal"))
      .orderBy(col("nk"))
  }

  private val q151Sql =
    """SELECT n_nationkey AS nk, count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_nationkey ORDER BY nk""".stripMargin

  // ------------------------------------- q152_meta_agg / q153_bloom_point
  // Shared fixture: the full orders table as a commit-log lake, 16 files
  // range-clustered by o_custkey, zone-map stats on (o_orderkey,
  // o_totalprice) and a per-file Bloom filter on o_custkey riding the
  // init commit. Built once per session per sf dir (the lake is these
  // queries' INPUT); cleaned up on JVM exit.
  private val q152Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q152Lake(s: SparkSession, d: String): String =
    q152Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q152_")
      val lake = s"$work/lake"
      Tables.orders(s, d)
        .repartitionByRange(16, col("o_custkey"))
        .write.parquet(lake)
      graft.sources.CommitLog.init(s, lake,
        statsCols = Seq("o_orderkey", "o_totalprice"),
        bloomCols = Seq("o_custkey"), bloomExpect = 1L << 17)
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      lake
    })

  // q152: exact count/min/max/count(c) answered from the committed
  // manifest alone — ZERO data files opened (proved brutally in
  // MetadataPlaneSpec by deleting the data files) — while the DuckDB
  // oracle reads every row of orders. Hash-match = the metadata plane
  // agrees with the data plane exactly.
  private def q152MetaAgg(s: SparkSession, d: String): DataFrame =
    graft.sources.CommitLog.statsAgg(s, q152Lake(s, d),
      Seq("o_orderkey", "o_totalprice"))

  private val q152Sql =
    """SELECT count(*) AS rows,
      |  min(o_orderkey) AS min_o_orderkey,
      |  max(o_orderkey) AS max_o_orderkey,
      |  count(o_orderkey) AS count_o_orderkey,
      |  min(o_totalprice) AS min_o_totalprice,
      |  max(o_totalprice) AS max_o_totalprice,
      |  count(o_totalprice) AS count_o_totalprice
      |FROM orders""".stripMargin

  // ------------------------------------------------- q168_stream_mirror
  // Exactly-once streaming CDC replication (streaming.LakeFollow.mirror):
  // a source orders lake is bootstrapped into a replica, the mirror
  // stream attaches, and TWO source commits land while it runs — a keyed
  // price-doubling upsert and a predicate delete. Each observed version
  // range moves only the touched partitions' post-image into the replica
  // via replacePartitions with batchId = source version (the replica's
  // own ledger is the resume cursor AND the replay guard — LakeFollowSpec
  // pins convergence, replay no-op, and crash-gap resume). A THIRD
  // commit is a merge-on-read delete: it adds no files, only a deletion
  // vector, so the follower only converges because partsBetween surfaces
  // the DV'd partitions and the post-image read applies the vectors —
  // the round-9 silent-stale-replica hole, now oracle-gated. The query
  // aggregates the REPLICA; the DuckDB oracle recomputes the source's
  // final state from raw orders, so the hash-match proves the replica
  // converged to exactly the source's committed truth. Fixture built
  // once per session; the stream stops before serving.
  private val q168Lakes = scala.collection.concurrent.TrieMap[String, String]()
  private def q168Lake(s: SparkSession, d: String): String =
    q168Lakes.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q168_")
      val src = s"$work/src"
      val dst = s"$work/dst"
      val ords = Tables.orders(s, d).filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus").as("flag"))
      ords.write.partitionBy("flag").parquet(src)
      graft.sources.CommitLog.init(s, src)
      graft.streaming.LakeFollow.bootstrapMirror(s, src, dst, "flag")
      val q = graft.streaming.LakeFollow.mirror(s, src, dst, "flag",
        checkpointDir = s"$work/chk")
      try {
        graft.sources.CommitLog.upsert(s,
          ords.filter(col("o_orderkey") <= 2000)
            .withColumn("o_totalprice", col("o_totalprice") * 2),
          src, Seq("o_orderkey"), "flag")
        graft.sources.CommitLog.delete(s, src,
          col("o_custkey") % 10 === 3)
        graft.sources.CommitLog.deleteVectors(s, src,
          col("o_custkey") % 10 === 7)
        val want = graft.sources.CommitLog.latest(s, src).get.version
        val t0 = System.currentTimeMillis()
        while (graft.sources.CommitLog.latest(s, dst)
            .flatMap(_.batches.maxOption).getOrElse(-1L) < want) {
          require(System.currentTimeMillis() - t0 < 120000,
            s"q168 mirror did not converge to source v$want")
          Thread.sleep(100)
        }
      } finally q.stop()
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      dst
    })

  private def q168StreamMirror(s: SparkSession, d: String): DataFrame =
    graft.sources.CommitLog.read(s, q168Lake(s, d))
      .groupBy(col("flag")).agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        min(col("o_orderkey")).as("min_ok"))
      .orderBy(col("flag"))

  private val q168Sql =
    """SELECT o_orderstatus AS flag, count(*) AS n,
      |  CAST(sum(CAST(CASE WHEN o_orderkey <= 2000 THEN o_totalprice * 2
      |                     ELSE o_totalprice END AS DECIMAL(18,2)))
      |       AS DOUBLE) AS sum_price,
      |  min(o_orderkey) AS min_ok
      |FROM orders
      |WHERE o_orderkey <= 20000 AND o_custkey % 10 NOT IN (3, 7)
      |GROUP BY 1 ORDER BY flag""".stripMargin

  // ----------------------------------------------------- q167_sql_lake
  // The lakehouse's spark.sql front door (graft.sources.LakeTvf): the
  // query is pure SQL TEXT over the graft_lake table function — no
  // DataFrame code touches the table — against q152's commit-logged
  // orders lake. The TVF splices the analyzed snapshot read in at
  // analysis time, so pushdown, pruning, and the optimizer rules all
  // apply to SQL users identically (LakeTvfSpec pins pushed filters and
  // the MV rewrite firing through SQL). The DuckDB oracle recomputes
  // from raw orders; hash-match proves the SQL path serves the same
  // committed snapshot the DataFrame path does.
  private def q167SqlLake(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT o_orderstatus AS st, count(*) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_price,
         |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
         |FROM graft_lake('${q152Lake(s, d)}')
         |GROUP BY o_orderstatus ORDER BY st""".stripMargin)

  private val q167Sql =
    """SELECT o_orderstatus AS st, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
      |FROM orders
      |GROUP BY o_orderstatus ORDER BY st""".stripMargin

  // q153: point lookup on the clustered key via the committed per-file
  // Bloom filters — opens only files that POSSIBLY hold the customer
  // (pruning ratio pinned in MetadataPlaneSpec; the file count depends
  // on fpp misfires, so only the DATA result is oracled).
  private def q153BloomPoint(s: SparkSession, d: String): DataFrame = {
    val (hits, _) =
      graft.sources.CommitLog.scanPoint(s, q152Lake(s, d), "o_custkey", 37L)
    hits.agg(
      count(lit(1)).as("n"),
      min(col("o_orderkey")).as("min_ok"),
      max(col("o_orderkey")).as("max_ok"),
      sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .as("sum_price"))
  }

  private val q153Sql =
    """SELECT count(*) AS n,
      |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders WHERE o_custkey = 37""".stripMargin

  // --------------------------------------------------- q154_incr_view
  // Incrementally-maintained materialized aggregate (IncrementalView):
  // an orders slice becomes a commit-log lake partitioned by
  // o_orderpriority, a priority-level revenue view bootstraps from it,
  // an upsert doubles the price of every order with key ≤ 2000, and a
  // refresh recomputes ONLY the touched partitions (the view's ledger
  // carries the base version). The query itself is the steady-state
  // serving path — an idempotent refresh (fresh → metadata no-op) plus
  // the snapshot-isolated view read — and the DuckDB oracle recomputes
  // the SAME numbers from raw orders, so hash-match proves the
  // incremental maintenance landed on the from-scratch aggregate.
  private val q154Views =
    scala.collection.concurrent.TrieMap[String, IncrementalView.Definition]()
  private def q154View(s: SparkSession, d: String): IncrementalView.Definition =
    q154Views.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q154_")
      val base = s"$work/base"
      val slice = Tables.orders(s, d).filter(col("o_orderkey") <= 20000L)
      slice.write.partitionBy("o_orderpriority").parquet(base)
      graft.sources.CommitLog.init(s, base)
      val defn = IncrementalView.Definition(
        base, s"$work/view", "o_orderpriority", Seq("o_orderpriority"),
        Seq(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          min(col("o_orderkey")).as("min_ok")))
      IncrementalView.refresh(s, defn) // bootstrap
      graft.sources.CommitLog.upsert(s,
        slice.filter(col("o_orderkey") <= 2000L)
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        base, Seq("o_orderkey"), "o_orderpriority")
      IncrementalView.refresh(s, defn) // incremental catch-up
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      defn
    })

  private def q154IncrView(s: SparkSession, d: String): DataFrame = {
    val defn = q154View(s, d)
    IncrementalView.refresh(s, defn) // steady state: fresh → no-op
    IncrementalView.read(s, defn)
      .select(col("o_orderpriority").as("pr"), col("n"),
        col("sum_price"), col("min_ok"))
      .orderBy(col("pr"))
  }

  private val q154Sql =
    """SELECT o_orderpriority AS pr, count(*) AS n,
      |  CAST(sum(CAST(CASE WHEN o_orderkey <= 2000 THEN o_totalprice * 2
      |                     ELSE o_totalprice END AS DECIMAL(18,2)))
      |       AS DOUBLE) AS sum_price,
      |  min(o_orderkey) AS min_ok
      |FROM orders WHERE o_orderkey <= 20000
      |GROUP BY 1 ORDER BY pr""".stripMargin

  // ------------------------------------------------ q155_view_rewrite
  // Transparent materialized-view routing (plans/RewriteAggregateOnView):
  // the fixture builds a commit-log orders lake partitioned by
  // o_orderpriority, registers an IncrementalView over it in the
  // MatViewCatalog, upserts (so the view's state came through the
  // INCREMENTAL refresh path), and refreshes. The query is then written
  // against the BASE table — filter + groupBy + count/sum/min/max/avg —
  // and the optimizer answers it from the view because the scanned file
  // set equals the latest snapshot and the view's ledger proves
  // freshness (routing itself is pinned in PlanAuditSpec/
  // ViewRewriteSpec). The DuckDB oracle recomputes from raw orders, so
  // a hash-match proves rewrite + incremental maintenance land on the
  // from-scratch answer. All aggregates are exact in IEEE double
  // (integer sums < 2^53; avg is one division of exact values).
  private val q155Views =
    scala.collection.concurrent.TrieMap[String, IncrementalView.Definition]()
  private def q155View(s: SparkSession, d: String): IncrementalView.Definition =
    q155Views.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft_q155_")
      val base = s"$work/base"
      val slice = Tables.orders(s, d).filter(col("o_orderkey") <= 40000L)
        .select("o_orderkey", "o_custkey", "o_orderpriority")
      slice.filter(col("o_orderkey") <= 30000L)
        .write.partitionBy("o_orderpriority").parquet(base)
      graft.sources.CommitLog.init(s, base)
      val defn = IncrementalView.Definition(
        base, s"$work/view", "o_orderpriority", Seq("o_orderpriority"),
        Seq(count(lit(1)).as("cnt"),
          sum(col("o_custkey")).as("sum_ck"),
          count(col("o_custkey")).as("cnt_ck"),
          min(col("o_orderkey")).as("min_ok"),
          max(col("o_orderkey")).as("max_ok")))
      graft.plans.MatViewCatalog.register(defn)
      IncrementalView.refresh(s, defn) // bootstrap
      // rows (30000, 40000] arrive as an upsert: the registered view's
      // serving state is produced by the incremental path, not the build
      graft.sources.CommitLog.upsert(s,
        slice.filter(col("o_orderkey") > 30000L),
        base, Seq("o_orderkey"), "o_orderpriority")
      IncrementalView.refresh(s, defn)
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      defn
    })

  private def q155ViewRewrite(s: SparkSession, d: String): DataFrame = {
    val defn = q155View(s, d)
    IncrementalView.refresh(s, defn) // steady state: fresh → metadata no-op
    graft.sources.CommitLog.read(s, defn.baseDir)
      .filter(col("o_orderpriority") =!= "3-MEDIUM")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_custkey")).as("sum_ck"),
        min(col("o_orderkey")).as("min_ok"),
        max(col("o_orderkey")).as("max_ok"),
        avg(col("o_custkey")).as("avg_ck"))
      .select(col("o_orderpriority").as("pr"), col("n"), col("sum_ck"),
        col("min_ok"), col("max_ok"), col("avg_ck"))
      .orderBy(col("pr"))
  }

  private val q155Sql =
    """SELECT o_orderpriority AS pr, count(*) AS n,
      |  CAST(sum(o_custkey) AS BIGINT) AS sum_ck,
      |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok,
      |  CAST(sum(o_custkey) AS DOUBLE) / CAST(count(o_custkey) AS DOUBLE)
      |    AS avg_ck
      |FROM orders
      |WHERE o_orderkey <= 40000 AND o_orderpriority <> '3-MEDIUM'
      |GROUP BY 1 ORDER BY pr""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q135_constraints", q135Constraints, Some(q135Sql)),
    Q("q155_view_rewrite", q155ViewRewrite, Some(q155Sql)),
    Q("q151_join_elim", q151JoinElim, Some(q151Sql)),
    Q("q152_meta_agg", q152MetaAgg, Some(q152Sql)),
    Q("q153_bloom_point", q153BloomPoint, Some(q153Sql)),
    Q("q154_incr_view", q154IncrView, Some(q154Sql)),
    Q("q137_skipping", q137Skipping, Some(q137Sql)),
    Q("q157_clustered_scan", q157ClusteredScan, Some(q137Sql)),
    Q("q158_delta_view", q158DeltaView, Some(q158Sql)),
    Q("q159_star_view", q159StarView, Some(q159Sql)),
    Q("q140_commitlog", q140CommitLog, Some(q140Sql)),
    Q("q141_txn", q141Txn, Some(q141Sql)),
    Q("q142_changes", q142Changes, Some(q142Sql)),
    Q("q146_manifest_quantiles", q146ManifestQuantiles, None),
    Q("q148_delete", q148Delete, Some(q148Sql)),
    Q("q166_restore", q166Restore, Some(q166Sql)),
    Q("q169_merge", q169Merge, Some(q169Sql)),
    Q("q170_wap", q170Wap, Some(q170Sql)),
    Q("q171_meta_groupby", q171MetaGroupby, Some(q171Sql)),
    Q("q175_meta_distinct", q175MetaDistinct, Some(q175Sql)),
    Q("q176_delete_mor", q176DeleteMor, Some(q148Sql)),
    Q("q177_sql_dml", q177SqlDml, Some(q177Sql)),
    Q("q178_sql_insert", q178SqlInsert, Some(q178Sql)),
    Q("q179_lake_cdf", q179LakeCdf, Some(q179Sql)),
    Q("q180_cdf_mirror", q180CdfMirror, Some(q180Sql)),
    Q("q181_zorder", q181Zorder, Some(q181Sql)),
    Q("q182_cdf_by_commit", q182CdfByCommit, Some(q182Sql)),
    Q("q183_sql_ddl", q183SqlDdl, Some(q183Sql)),
    Q("q184_catalog", q184Catalog, Some(q184Sql)),
    Q("q185_catalog_write", q185CatalogWrite, Some(q185Sql)),
    Q("q186_widen", q186Widen, Some(q186Sql)),
    Q("q188_compact_where", q188CompactWhere, Some(q188Sql)),
    Q("q191_branch", q191Branch, Some(q191Sql)),
    Q("q192_format_io", q192FormatIo, Some(q192Sql)),
    Q("q193_clone", q193Clone, Some(q192Sql)),
    Q("q196_branch_merge", q196BranchMerge, Some(q196Sql)),
    Q("q198_txn_append", q198TxnAppend, Some(q198Sql)),
    Q("q200_txn_delete", q200TxnDelete, Some(q200Sql)),
    Q("q201_txn_restate", q201TxnRestate, Some(q201Sql)),
    Q("q202_txn_sql", q202TxnSql, Some(q200Sql)),
    Q("q205_txn_time_travel", q205TimeTravel, Some(q205Sql)),
    Q("q206_txn_changes", q206TxnChanges, Some(q206Sql)),
    Q("q167_sql_lake", q167SqlLake, Some(q167Sql)),
    Q("q168_stream_mirror", q168StreamMirror, Some(q168Sql)),
    Q("q77_sql_shipping", q77Shipping, Some(q77Sql)),
    Q("q78_sql_volume", q78Volume, Some(q78Sql)),
    Q("q79_sql_returns", q79Returns, Some(q79Sql)),
    Q("q80_moving_median", q80MovingMedian, Some(q80Sql)),
    Q("q81_entropy", q81Entropy, Some(q81Sql)),
    Q("q82_url_parse", q82UrlParse, Some(q82Sql)),
    Q("q83_unicode_nfc", q83UnicodeNfc, Some(q83Sql)),
    Q("q88_sql_custdist", q88Custdist, Some(q88Sql)),
    Q("q89_sql_promo", q89Promo, Some(q89Sql)),
    Q("q90_sql_bigorders", q90BigOrders, Some(q90Sql)),
  )
}

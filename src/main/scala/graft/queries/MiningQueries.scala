package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Data-mining / robust-statistics pack: corpus LM quality scoring, OHLC
  * downsampling, MAD outliers, market-basket co-occurrence, triangle
  * counting, and winsorized means. Continues the oracle-parity rules of
  * [[AnalyticsQueries]]: integer/DECIMAL reduces wherever a double would
  * be order-dependent, round(…, 6) where per-group double sums are
  * unavoidable, total output order everywhere.
  */
object MiningQueries {

  // ------------------------------------------------------ q108_bigram_lm
  // Self-trained bigram-LM quality score per document (CCNet-style): the
  // corpus is its own model; mean bigram log-prob separates templated
  // text (near 0) from rare junk (very negative). Tokenization mirrors
  // q81's engine-portable form (trim+lower, split on \s+, drop empties).
  private def q108BigramLm(s: SparkSession, d: String): DataFrame =
    graft.ops.CorpusOps.bigramLmScore(
      Tables.documents(s, d), "doc_id", "text",
      t => split(trim(lower(t)), "\\s+"))

  private val q108Sql =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term,
      |    generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS pos
      |  FROM documents),
      |tokf AS (SELECT * FROM tok WHERE term <> ''),
      |adj AS (SELECT doc_id, term AS w1,
      |          lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |        FROM tokf),
      |pairs AS (SELECT doc_id, w1, w2 FROM adj WHERE w2 IS NOT NULL),
      |cb AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY 1, 2),
      |cu AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  round(avg(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))), 6) AS lm_score
      |FROM pairs JOIN cb USING (w1, w2) JOIN cu USING (w1)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- q109_ohlc
  // Daily OHLC bars per user over the events stream — the classic
  // downsample: ticks → |keys|·|buckets| rows, one shuffle.
  private def q109Ohlc(s: SparkSession, d: String): DataFrame =
    graft.ops.TimeSeriesOps.ohlcBars(
        Tables.events(s, d), "user_id", "ts", "value", "event_id",
        date_trunc("day", col("ts")))
      .withColumn("bucket", date_format(col("bucket"), "yyyy-MM-dd"))

  private val q109Sql =
    """WITH b AS (
      |  SELECT user_id, date_trunc('day', ts) AS bucket, ts, event_id, value
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      |r AS (SELECT *,
      |  row_number() OVER (PARTITION BY user_id, bucket
      |                     ORDER BY ts, event_id) AS ra,
      |  row_number() OVER (PARTITION BY user_id, bucket
      |                     ORDER BY ts DESC, event_id DESC) AS rd
      |  FROM b)
      |SELECT user_id, strftime(bucket, '%Y-%m-%d') AS bucket,
      |  max(CASE WHEN ra = 1 THEN value END) AS open,
      |  max(value) AS high, min(value) AS low,
      |  max(CASE WHEN rd = 1 THEN value END) AS close,
      |  count(*) AS n_events
      |FROM r GROUP BY user_id, bucket
      |ORDER BY user_id, bucket""".stripMargin

  // ---------------------------------------------------- q110_mad_outliers
  // Robust per-user outlier summary: median / MAD / k=3 exceedance
  // counts. Complements q95's z-score flagger on heavy-tailed telemetry.
  private def q110MadOutliers(s: SparkSession, d: String): DataFrame =
    graft.ops.AnalyticsOps.madOutliers(
      Tables.events(s, d).select(col("user_id"), col("value")),
      "user_id", "value", k = 3)

  private val q110Sql =
    """WITH med AS (
      |  SELECT user_id,
      |    percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
      |  FROM events GROUP BY 1),
      |dev AS (
      |  SELECT e.user_id, abs(e.value - m.med) AS adev, m.med
      |  FROM events e JOIN med m USING (user_id)),
      |mad AS (
      |  SELECT user_id, count(*) AS n, min(med) AS med,
      |    percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT dev.user_id, min(mad.n) AS n, round(min(mad.med), 6) AS med,
      |  round(min(mad.mad), 6) AS mad,
      |  CAST(sum(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers
      |FROM dev JOIN mad USING (user_id)
      |GROUP BY dev.user_id ORDER BY dev.user_id""".stripMargin

  // --------------------------------------------------------- q111_basket
  // Market-basket mining: part pairs co-ordered in ≥ 2 shared orders,
  // top-100 by support. The skew guard (baskets > 50 items dropped) is
  // mirrored in the oracle so semantics stay identical.
  private def q111Basket(s: SparkSession, d: String): DataFrame =
    graft.ops.GraphOps.cooccurrencePairs(
        Tables.lineitem(s, d), "l_orderkey", "l_partkey",
        minSupport = 2L, maxBasket = 50)
      .orderBy(col("support").desc, col("item1"), col("item2"))
      .limit(100)

  private val q111Sql =
    """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
      |ok AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 50),
      |bis AS (SELECT bi.* FROM bi JOIN ok USING (b)),
      |p AS (SELECT a.i AS item1, b.i AS item2
      |      FROM bis a JOIN bis b ON a.b = b.b AND a.i < b.i)
      |SELECT item1, item2, count(*) AS support
      |FROM p GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY support DESC, item1, item2 LIMIT 100""".stripMargin

  // ------------------------------------------------------ q112_triangles
  // Per-node triangle participation on the q111 co-occurrence graph
  // (canonical src < dst orientation, wedge-closure join), top-50 nodes.
  private def q112Triangles(s: SparkSession, d: String): DataFrame = {
    val edges = graft.ops.GraphOps.cooccurrencePairs(
      Tables.lineitem(s, d), "l_orderkey", "l_partkey",
      minSupport = 2L, maxBasket = 50)
    graft.ops.GraphOps.triangleCounts(edges, "item1", "item2")
      .orderBy(col("n_triangles").desc, col("node"))
      .limit(50)
  }

  private val q112Sql =
    """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
      |ok AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 50),
      |bis AS (SELECT bi.* FROM bi JOIN ok USING (b)),
      |p AS (SELECT a.i AS item1, b.i AS item2
      |      FROM bis a JOIN bis b ON a.b = b.b AND a.i < b.i),
      |e AS (SELECT item1 AS a, item2 AS b FROM p
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |t AS (SELECT e1.a, e1.b, e2.b AS c
      |      FROM e e1 JOIN e e2 ON e1.b = e2.a
      |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |nodes AS (SELECT a AS node FROM t
      |          UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t)
      |SELECT node, count(*) AS n_triangles
      |FROM nodes GROUP BY 1
      |ORDER BY n_triangles DESC, node LIMIT 50""".stripMargin

  // ------------------------------------------------------ q113_winsorize
  // Winsorized per-type value means: clamp to the exact [p05, p95] band,
  // count clamped tails, DECIMAL-exact mean of the clamped column.
  private def q113Winsorize(s: SparkSession, d: String): DataFrame =
    graft.ops.AnalyticsOps.winsorize(
      Tables.events(s, d).select(col("event_type"), col("value")),
      "event_type", "value", pLo = 0.05, pHi = 0.95)

  private val q113Sql =
    """WITH bands AS (
      |  SELECT event_type,
      |    percentile_cont(0.05) WITHIN GROUP (ORDER BY value) AS lo,
      |    percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS hi
      |  FROM events GROUP BY 1)
      |SELECT e.event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      |  CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
      |  round(min(b.lo), 6) AS p_lo,
      |  round(min(b.hi), 6) AS p_hi,
      |  round(CAST(sum(CAST(least(greatest(e.value, b.lo), b.hi)
      |                      AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
      |    AS wins_mean
      |FROM events e JOIN bands b USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  // --------------------------------------------------- q120_transitions
  // Markov transition matrix over per-user event sequences: count and
  // within-source probability of each (prev → next) event-type step.
  // One lead() window by user (no self-join), one pair aggregation, one
  // tiny window over the |types|² matrix for the row-normalization.
  private def q120Transitions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // ts IS NOT NULL on BOTH sides: Spark window-sorts nulls first,
    // DuckDB last — a null timestamp would silently reorder the sequence
    val steps = Tables.events(s, d)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
    steps.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("src"))), 6))
      .orderBy(col("src"), col("dst"))
  }

  private val q120Sql =
    """WITH steps AS (
      |  SELECT event_type AS src,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) AS dst
      |  FROM events WHERE ts IS NOT NULL),
      |m AS (SELECT src, dst, count(*) AS n FROM steps
      |      WHERE dst IS NOT NULL GROUP BY 1, 2)
      |SELECT src, dst, n,
      |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src), 6) AS p
      |FROM m ORDER BY src, dst""".stripMargin

  // ------------------------------------------------- q121_jaccard_prefix
  // Prefix-filtered (PPJoin-style) exact Jaccard pairs at t = 0.4 over a
  // 100-doc set. Blocking is lossless, so the oracle runs BRUTE FORCE
  // (n²/2 pairs) and the results must match exactly — the scale path is
  // verified against the spec it must preserve, not trusted.
  private def q121JaccardPrefix(s: SparkSession, d: String): DataFrame =
    graft.dedup.Dedup.jaccardPairsPrefix(
        Tables.documents(s, d).filter(col("doc_id") < 100),
        "doc_id", "text", threshold = 0.4)
      .withColumn("jaccard", round(col("jaccard"), 6))
      .orderBy(col("id_a"), col("id_b"))

  private val q121Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS toks
      |  FROM documents WHERE doc_id < 100),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
      |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
      |SELECT id_a, id_b, round(jaccard, 6) AS jaccard
      |FROM p WHERE jaccard >= 0.4
      |ORDER BY id_a, id_b""".stripMargin

  // ----------------------------------------------------------- q122_locf
  // Last-observation-carried-forward: each event carries the user's most
  // recent purchase amount — nulls inherit through the running
  // ignore-nulls last(). One window, one shuffle.
  private def q122Locf(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("ts").isNotNull) // null-sort parity guard, as in q120
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "purchase", col("value")).as("pv"))
      .withColumn("last_purchase",
        graft.ops.TimeSeriesOps.locf("user_id",
          Seq(col("ts"), col("event_id")), col("pv")))
      .select(col("event_id"), col("user_id"), col("last_purchase"))
      .orderBy(col("event_id"))

  private val q122Sql =
    """SELECT event_id, user_id,
      |  last_value(CASE WHEN event_type = 'purchase' THEN value END
      |             IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS last_purchase
      |FROM events WHERE ts IS NOT NULL ORDER BY event_id""".stripMargin

  // -------------------------------------------------- q123_cume_distinct
  // Running distinct users per day — first-seen reduction + prefix sum,
  // NOT a per-prefix re-count (see AnalyticsOps.cumulativeDistinct).
  private def q123CumeDistinct(s: SparkSession, d: String): DataFrame =
    graft.ops.AnalyticsOps.cumulativeDistinct(
        Tables.events(s, d), "user_id", to_date(col("ts")))
      .withColumn("bucket", date_format(col("bucket"), "yyyy-MM-dd"))
      .withColumnRenamed("bucket", "day")
      .withColumnRenamed("new_entities", "new_users")
      .withColumnRenamed("cume_entities", "cume_users")

  private val q123Sql =
    """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d
      |           FROM events GROUP BY 1),
      |n AS (SELECT d, count(*) AS new_users FROM f GROUP BY 1)
      |SELECT strftime(d, '%Y-%m-%d') AS day, new_users,
      |  CAST(sum(new_users) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
      |    PRECEDING AND CURRENT ROW) AS BIGINT) AS cume_users
      |FROM n ORDER BY day""".stripMargin

  // -------------------------------------------------- q124_temporal_join
  // Point-in-time join: every event of the q87 SCD2 users resolves the
  // status interval covering its timestamp (valid_from inclusive,
  // valid_to exclusive, open interval = current), then counts per
  // (user, version). Equi-join on the key carries the range predicate.
  private def q124TemporalJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("user_id") % 20 === 0 && col("ts").isNotNull)
    val iv = graft.ops.TimeSeriesOps.scd2(
      ev, col("user_id"), col("event_type"), col("ts"), col("event_id"))
    graft.ops.TimeSeriesOps.pointInTimeJoin(
        ev.select(col("user_id"), col("ts")), iv, "user_id", "ts", "key")
      .groupBy(col("key").as("user_id"), col("version"), col("status"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("version"))
  }

  private val q124Sql =
    """WITH marked AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC) AS prev
      |  FROM events WHERE user_id % 20 = 0 AND ts IS NOT NULL),
      |changes AS (
      |  SELECT * FROM marked WHERE prev IS NULL OR prev <> event_type),
      |iv AS (
      |  SELECT user_id AS k, event_type AS status, ts AS valid_from,
      |    lead(ts, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC) AS valid_to,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC) AS INT) AS version
      |  FROM changes)
      |SELECT e.user_id, iv.version, iv.status, count(*) AS n_events
      |FROM events e
      |JOIN iv ON e.user_id = iv.k AND e.ts >= iv.valid_from
      |  AND (e.ts < iv.valid_to OR iv.valid_to IS NULL)
      |WHERE e.user_id % 20 = 0 AND e.ts IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY e.user_id, iv.version""".stripMargin

  // -------------------------------------------------- q125_feature_scale
  // Per-dimension z-score standardization of the embedding table,
  // flattened to (vec_id, dim, z6) — DECIMAL power sums per dim,
  // identical IEEE op sequence for the closed-form z on both engines.
  private def q125FeatureScale(s: SparkSession, d: String): DataFrame =
    graft.sim.Similarity.standardizeDims(
        Tables.embeddings(s, d), "vec_id", "embedding")
      .orderBy(col("vec_id"), col("dim"))

  private val q125Sql =
    """WITH e AS (
      |  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
      |    generate_subscripts(embedding, 1) AS dim
      |  FROM embeddings),
      |st AS (
      |  SELECT dim, count(*) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(20,10))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(x*x AS DECIMAL(24,12))) AS DOUBLE) AS sxx
      |  FROM e GROUP BY 1)
      |SELECT e.vec_id, e.dim,
      |  CASE WHEN sxx/n - (sx/n)*(sx/n) > 0
      |       THEN round((e.x - sx/n) / sqrt(sxx/n - (sx/n)*(sx/n)), 6)
      |       END AS z6
      |FROM e JOIN st USING (dim)
      |ORDER BY e.vec_id, e.dim""".stripMargin

  // ------------------------------------------------------------ q127_bfs
  // Iterative BFS over the customer↔supplier trade graph: minimum hop
  // distance from customer 1's node, ≤ 3 hops, summarized per depth.
  // The oracle is a recursive CTE with min-depth dedup — the engine's
  // frontier/visited loop must produce the identical depth labeling.
  private def q127Bfs(s: SparkSession, d: String): DataFrame = {
    val edges = TradeGraph.edges(s, d)
    graft.ops.GraphOps.bfsDepths(edges, "src", "dst", Seq(2L), maxDepth = 3)
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("node")).as("min_node"), max(col("node")).as("max_node"))
      .orderBy(col("depth"))
  }

  private val q127Sql =
    """WITH RECURSIVE e0 AS (
      |  SELECT DISTINCT o_custkey*2 AS s, l_suppkey*2+1 AS d
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |e AS (SELECT s, d FROM e0 UNION ALL SELECT d, s FROM e0),
      |walk(node, depth) AS (
      |  SELECT CAST(2 AS BIGINT) AS node, 0 AS depth
      |  UNION
      |  SELECT e.d, w.depth + 1 FROM walk w
      |  JOIN e ON e.s = w.node WHERE w.depth < 3)
      |SELECT depth, count(*) AS n_nodes,
      |  min(node) AS min_node, max(node) AS max_node
      |FROM (SELECT node, min(depth) AS depth FROM walk GROUP BY node) m
      |GROUP BY depth ORDER BY depth""".stripMargin

  // ------------------------------------------------- q128_regex_extract
  // Multi-match regex extraction (regexp_extract_all) + a higher-order
  // filter over the match list — ASCII-only pattern so Java regex and
  // RE2 agree. Counts per doc: alpha runs, vowel-initial runs, ratio.
  private def q128RegexExtract(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))
          .as("words"))
      .select(col("doc_id"),
        size(col("words")).as("n_words"),
        size(filter(col("words"), w => w.rlike("^[aeiou]")))
          .as("n_vowel"))
      .withColumn("vowel_ratio",
        when(col("n_words") > 0,
          round(col("n_vowel").cast("double") / col("n_words"), 6)))
      .orderBy(col("doc_id"))

  private val q128Sql =
    """SELECT doc_id,
      |  len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
      |  len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
      |      w -> regexp_matches(w, '^[aeiou]'))) AS n_vowel,
      |  CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+')) > 0
      |    THEN round(
      |      CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
      |                           w -> regexp_matches(w, '^[aeiou]'))) AS DOUBLE)
      |      / len(regexp_extract_all(lower(text), '[a-z]+')), 6)
      |    END AS vowel_ratio
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- q129_pmi
  // Collocation mining: top-50 adjacent-token pairs by pointwise mutual
  // information (min count 5) — the corpus's multiword expressions.
  // Tokenization mirrors q81/q108; ordering is total (rounded PMI desc,
  // then the pair) so LIMIT is reproducible.
  private def q129Pmi(s: SparkSession, d: String): DataFrame =
    graft.ops.CorpusOps.collocationsPmi(
      Tables.documents(s, d), "doc_id", "text",
      t => split(trim(lower(t)), "\\s+"), minCount = 5L, k = 50)

  private val q129Sql =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term,
      |    generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS pos
      |  FROM documents),
      |tokf AS (SELECT * FROM tok WHERE term <> ''),
      |adj AS (SELECT doc_id, term AS w1,
      |          lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |        FROM tokf),
      |p AS (SELECT w1, w2 FROM adj WHERE w2 IS NOT NULL),
      |n AS (SELECT count(*) AS total FROM p),
      |cb AS (SELECT w1, w2, count(*) AS c2 FROM p GROUP BY 1, 2),
      |cu1 AS (SELECT w1, count(*) AS c1 FROM p GROUP BY 1),
      |cu2 AS (SELECT w2, count(*) AS cc2 FROM p GROUP BY 1)
      |SELECT w1, w2, c2,
      |  round(ln(CAST(c2 AS DOUBLE) * (SELECT total FROM n)
      |           / (CAST(c1 AS DOUBLE) * cc2)), 6) AS pmi
      |FROM cb JOIN cu1 USING (w1) JOIN cu2 USING (w2)
      |WHERE c2 >= 5
      |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q108_bigram_lm", q108BigramLm, Some(q108Sql)),
    Q("q109_ohlc", q109Ohlc, Some(q109Sql)),
    Q("q110_mad_outliers", q110MadOutliers, Some(q110Sql)),
    Q("q111_basket", q111Basket, Some(q111Sql)),
    Q("q112_triangles", q112Triangles, Some(q112Sql)),
    Q("q113_winsorize", q113Winsorize, Some(q113Sql)),
    Q("q120_transitions", q120Transitions, Some(q120Sql)),
    Q("q121_jaccard_prefix", q121JaccardPrefix, Some(q121Sql)),
    Q("q122_locf", q122Locf, Some(q122Sql)),
    Q("q123_cume_distinct", q123CumeDistinct, Some(q123Sql)),
    Q("q124_temporal_join", q124TemporalJoin, Some(q124Sql)),
    Q("q125_feature_scale", q125FeatureScale, Some(q125Sql)),
    Q("q127_bfs", q127Bfs, Some(q127Sql)),
    Q("q128_regex_extract", q128RegexExtract, Some(q128Sql)),
    Q("q129_pmi", q129Pmi, Some(q129Sql)))
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.dedup.Dedup
import graft.ops.CorpusOps
import graft.sim.Similarity
import graft.tables.Tables

/** Round-2 pipeline surface: within-document repetition quality signals,
  * cross-document boilerplate detection, deterministic stratified
  * sampling, sliding event-time windows, outer joins, int8 embedding
  * quantization, and exact token-set Jaccard — all DuckDB-oracled.
  */
object PipelineQueries {

  private def sumD2(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  // ---------------------------------------------------- q62_repetition
  // Gopher-style repetition filters. Fractions are int/int double
  // divisions — bit-identical across engines, no rounding needed.
  private def q62Repetition(s: SparkSession, d: String): DataFrame =
    CorpusOps.repetitionSignals(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val q62Sql =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, t,
      |    list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS g2
      |  FROM tok),
      |tf AS (SELECT doc_id, unnest(t) AS term FROM tok),
      |top AS (
      |  SELECT doc_id, max(cnt) AS top_count FROM (
      |    SELECT doc_id, term, count(*) AS cnt
      |    FROM tf GROUP BY doc_id, term) GROUP BY doc_id)
      |SELECT g.doc_id,
      |  len(t) AS total_tokens,
      |  len(list_distinct(t)) AS distinct_tokens,
      |  len(g2) AS total_2grams,
      |  len(list_distinct(g2)) AS distinct_2grams,
      |  coalesce(top_count, 0) AS top_count,
      |  CASE WHEN len(t) > 0
      |    THEN 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
      |    ELSE 0.0 END AS dup_token_frac,
      |  CASE WHEN len(t) > 0
      |    THEN CAST(coalesce(top_count, 0) AS DOUBLE) / len(t)
      |    ELSE 0.0 END AS top_token_frac,
      |  CASE WHEN len(g2) > 0
      |    THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
      |    ELSE 0.0 END AS dup_2gram_frac
      |FROM g LEFT JOIN top ON g.doc_id = top.doc_id
      |ORDER BY g.doc_id""".stripMargin

  // --------------------------------------------------- q63_boilerplate
  private def q63Boilerplate(s: SparkSession, d: String): DataFrame =
    CorpusOps.boilerplateGrams(
      Tables.documents(s, d), "doc_id", "text", n = 5, minDocs = 3L, maxSize = 100)

  private val q63Sql =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, array_to_string(t[u.i:u.i+4], ' ') AS gram
      |  FROM tok, UNNEST(range(1, len(t) - 3)) AS u(i)
      |  WHERE len(t) >= 5)
      |SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
      |FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 3
      |ORDER BY n_docs DESC, gram LIMIT 100""".stripMargin

  // ------------------------------------------------ q64_sliding_window
  // Native sliding windows (30 min wide, 15 min slide): every event lands
  // in exactly two windows. The oracle unrolls the two offsets per event.
  private def q64Sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "30 minutes", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sumD2(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("w_start_epoch"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("w_start_epoch"), col("event_type"))

  private val q64Sql =
    """WITH w AS (
      |  SELECT CAST(floor(epoch(time_bucket(INTERVAL 15 minutes, ts))) AS BIGINT)
      |           - u.k * 900 AS w_start_epoch,
      |         event_type, value
      |  FROM events, UNNEST([0, 1]) AS u(k))
      |SELECT w_start_epoch, event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------- q65_strat_sample
  private def q65Sample(s: SparkSession, d: String): DataFrame =
    CorpusOps.stratifiedSample(Tables.documents(s, d), "doc_id", "source", 0.1)
      .select(col("doc_id"), col("source"), col("rn"), col("n_stratum"))
      .orderBy(col("source"), col("rn"))

  private val q65Sql =
    """WITH r AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
      |    count(*) OVER (PARTITION BY source) AS n_stratum
      |  FROM documents)
      |SELECT doc_id, source, rn, n_stratum FROM r
      |WHERE rn <= ceil(0.1 * n_stratum)
      |ORDER BY source, rn""".stripMargin

  // --------------------------------------------------- q66_full_outer
  // Full outer join of two sparse per-nation aggregates (top-balance
  // customers vs top-balance suppliers) — nations appear on one side,
  // the other, both, or neither; USING-style key coalescing on both
  // engines.
  private def q66FullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_rich_cust"))
    val sup = Tables.supplier(s, d).filter(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_rich_supp"))
    c.join(sup, Seq("nationkey"), "full_outer")
      .orderBy(col("nationkey"))
  }

  private val q66Sql =
    """SELECT nationkey, n_rich_cust, n_rich_supp
      |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_rich_cust
      |      FROM customer WHERE c_acctbal > 9000 GROUP BY 1) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS nationkey, count(*) AS n_rich_supp
      |      FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) s
      |USING (nationkey)
      |ORDER BY nationkey""".stripMargin

  // ----------------------------------------------------- q67_quantize
  // Absmax int8 quantization; 127·e/max|e| is the same IEEE double op
  // sequence on both engines, and round-half-away agrees on identical
  // doubles, so the int grid is exact.
  private def q67Quantize(s: SparkSession, d: String): DataFrame =
    Similarity.quantizeInt8(Tables.embeddings(s, d), "vec_id", "embedding")
      .orderBy(col("vec_id"), col("dim"))

  private val q67Sql =
    """WITH u AS (
      |  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS e,
      |    CAST(generate_subscripts(embedding, 1) AS INT) AS dim
      |  FROM embeddings),
      |m AS (
      |  SELECT vec_id, dim, e, max(abs(e)) OVER (PARTITION BY vec_id) AS maxabs
      |  FROM u)
      |SELECT vec_id, dim,
      |  CASE WHEN maxabs > 0 THEN CAST(round(127.0 * e / maxabs) AS INT)
      |       ELSE 0 END AS q8
      |FROM m ORDER BY vec_id, dim""".stripMargin

  // ------------------------------------------------ q68_jaccard_pairs
  // Exact token-set Jaccard over a 15-doc probe set (105 pairs) — the
  // hashed-shingle near-dup operators' semantics, verifiable end-to-end.
  private def q68Jaccard(s: SparkSession, d: String): DataFrame =
    Dedup.tokenJaccardPairs(
      Tables.documents(s, d).filter(col("doc_id") < 15), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b"))

  private val q68Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS toks
      |  FROM documents WHERE doc_id < 15)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
      |FROM t a JOIN t b ON a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------- q69_embed_neardup
  // Embedding-cosine near-dup pairs, exactness baseline over a 300-vector
  // probe set (44850 pairs) — the LSH-bucketed scale path shares these
  // semantics (SimilaritySpec pins the injected-dup recall there).
  private def q69EmbedNearDup(s: SparkSession, d: String): DataFrame =
    Similarity.exactNearDupPairs(
      Tables.embeddings(s, d).filter(col("vec_id") < 300),
      "vec_id", "embedding", threshold = 0.3)
      .orderBy(col("id_a"), col("id_b"))

  private val q69Sql =
    """WITH t AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings WHERE vec_id < 300)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_cosine_similarity(a.v, b.v), 6) AS sim6
      |FROM t a JOIN t b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------- q70_span_dedup
  // CCNet-style sub-document dedup: first occurrence of each distinct
  // 32-token chunk survives; docs reassembled from surviving chunks.
  private def q70SpanDedup(s: SparkSession, d: String): DataFrame =
    CorpusOps.dedupSpans(Tables.documents(s, d), "doc_id", "text", chunkTokens = 32)
      .orderBy(col("doc_id"))

  private val q70Sql =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |s AS (
      |  SELECT doc_id, t, u.i AS start
      |  FROM tok, UNNEST(range(1, greatest(len(t), 1) + 1, 32)) AS u(i)),
      |c AS (
      |  SELECT doc_id, CAST((start - 1) / 32 AS BIGINT) AS chunk_idx,
      |    array_to_string(t[start:start+31], ' ') AS chunk
      |  FROM s),
      |rk AS (
      |  SELECT doc_id, chunk_idx, chunk,
      |    row_number() OVER (PARTITION BY md5(chunk)
      |      ORDER BY doc_id, chunk_idx) AS occ
      |  FROM c)
      |SELECT doc_id, count(*) AS n_chunks,
      |  count(CASE WHEN occ = 1 THEN 1 END) AS n_kept,
      |  coalesce(string_agg(CASE WHEN occ = 1 THEN chunk END, ' '
      |    ORDER BY chunk_idx), '') AS clean_text
      |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------- q71_moments
  // Exact distributed second moments: stddev / covariance / correlation
  // from DECIMAL-summed power sums — order-independent under any
  // partitioning (a double Welford merge drifts with the shuffle
  // layout), one pass, one shuffle of |groups| rows.
  private def q71Moments(s: SparkSession, d: String): DataFrame = {
    val q = col("l_quantity")
    val p = col("l_extendedprice")
    val n = count(lit(1))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        n.as("n"),
        sum(q.cast(DecimalType(18, 2))).cast("double").as("s_q"),
        sum(p.cast(DecimalType(18, 2))).cast("double").as("s_p"),
        sum((q * q).cast(DecimalType(28, 6))).cast("double").as("ss_q"),
        sum((p * p).cast(DecimalType(28, 6))).cast("double").as("ss_p"),
        sum((q * p).cast(DecimalType(28, 6))).cast("double").as("s_qp"))
      .select(col("l_returnflag"), col("n"),
        round(sqrt((col("ss_q") - col("s_q") * col("s_q") / col("n"))
          / (col("n") - 1)), 6).as("sd_qty"),
        round(sqrt((col("ss_p") - col("s_p") * col("s_p") / col("n"))
          / (col("n") - 1)), 6).as("sd_price"),
        round((col("s_qp") - col("s_q") * col("s_p") / col("n"))
          / (col("n") - 1), 6).as("cov_qp"),
        round(((col("s_qp") - col("s_q") * col("s_p") / col("n")) / (col("n") - 1))
          / (sqrt((col("ss_q") - col("s_q") * col("s_q") / col("n")) / (col("n") - 1))
            * sqrt((col("ss_p") - col("s_p") * col("s_p") / col("n")) / (col("n") - 1))), 6)
          .as("corr_qp"))
      .orderBy(col("l_returnflag"))
  }

  private val q71Sql =
    """WITH m AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s_q,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s_p,
      |    CAST(sum(CAST(l_quantity*l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS ss_q,
      |    CAST(sum(CAST(l_extendedprice*l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS ss_p,
      |    CAST(sum(CAST(l_quantity*l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS s_qp
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, n,
      |  round(sqrt((ss_q - s_q*s_q/n) / (n-1)), 6) AS sd_qty,
      |  round(sqrt((ss_p - s_p*s_p/n) / (n-1)), 6) AS sd_price,
      |  round((s_qp - s_q*s_p/n) / (n-1), 6) AS cov_qp,
      |  round(((s_qp - s_q*s_p/n) / (n-1))
      |    / (sqrt((ss_q - s_q*s_q/n) / (n-1)) * sqrt((ss_p - s_p*s_p/n) / (n-1))), 6)
      |    AS corr_qp
      |FROM m ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------- q72_editdist
  // Levenshtein near-dup pairs (fuzzy dedup on short strings).
  private def q72EditDist(s: SparkSession, d: String): DataFrame =
    Dedup.editDistancePairs(
      Tables.part(s, d).filter(col("p_partkey") < 200), "p_partkey", "p_name",
      maxDist = 3)
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"), col("dist"))
      .orderBy(col("id_a"), col("id_b"))

  private val q72Sql =
    """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      |  a.p_name AS s_a, b.p_name AS s_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
      |FROM part a JOIN part b
      |  ON a.p_partkey < b.p_partkey
      | AND a.p_partkey < 200 AND b.p_partkey < 200
      | AND levenshtein(a.p_name, b.p_name) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------------ q73_setops_all
  // Multiset set ops (EXCEPT ALL / INTERSECT ALL — q13 covers the
  // distinct forms); the trailing count-per-key keeps the compare
  // compact. Each branch counts DIRECTLY over its setop — the shape
  // [[graft.plans.FoldCountOverReplicateRows]] folds: count(1) per key
  // over the setop becomes sum(multiplicity) over the rewrite's
  // pre-replication aggregate, so the replicated multiset never
  // materializes and the second exchange disappears (the fold's
  // aggregate reuses the multiplicity aggregate's partitioning).
  private def q73SetopsAll(s: SparkSession, d: String): DataFrame = {
    val hiQty = Tables.lineitem(s, d).filter(col("l_quantity") > 30)
      .select(col("l_orderkey"))
    val hiDisc = Tables.lineitem(s, d).filter(col("l_discount") > 0.05)
      .select(col("l_orderkey"))
    def counted(df: DataFrame, op: String): DataFrame =
      df.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
        .select(lit(op).as("op"), col("l_orderkey"), col("n"))
    counted(hiQty.exceptAll(hiDisc), "except_all")
      .unionByName(counted(hiQty.intersectAll(hiDisc), "intersect_all"))
      .orderBy(col("op"), col("l_orderkey"))
  }

  private val q73Sql =
    """WITH a AS (SELECT l_orderkey FROM lineitem WHERE l_quantity > 30),
      |b AS (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05),
      |u AS (
      |  SELECT 'except_all' AS op, l_orderkey FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
      |  UNION ALL
      |  SELECT 'intersect_all' AS op, l_orderkey FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b))
      |SELECT op, l_orderkey, count(*) AS n
      |FROM u GROUP BY 1, 2 ORDER BY op, l_orderkey""".stripMargin

  // --------------------------------------------------- q138_setop_sums
  // SUM/AVG directly over EXCEPT ALL — the generalized
  // [[graft.plans.FoldCountOverReplicateRows]] shape: each surviving
  // row's contribution is its value times its multiplicity, so the
  // aggregate folds to multiplicity-weighted sums over the
  // pre-replication rows and the replicated multiset never exists.
  // Quantities go through BIGINT because the fold's exactness gate only
  // admits integral sums (float sums round differently when folded);
  // l_quantity is integral-valued, so the cast is lossless on both
  // engines despite their different double→int rounding rules.
  private def q138SetopSums(s: SparkSession, d: String): DataFrame = {
    def branch(pred: org.apache.spark.sql.Column) =
      Tables.lineitem(s, d).filter(pred)
        .select(col("l_returnflag"), col("l_orderkey"),
          col("l_quantity").cast("long").as("qty"))
    branch(col("l_quantity") > 30).exceptAll(branch(col("l_discount") > 0.05))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"),
        avg(col("qty")).as("avg_qty"))
      .orderBy(col("l_returnflag"))
  }

  private val q138Sql =
    """WITH a AS (SELECT l_returnflag, l_orderkey, CAST(l_quantity AS BIGINT) AS qty
      |           FROM lineitem WHERE l_quantity > 30),
      |b AS (SELECT l_returnflag, l_orderkey, CAST(l_quantity AS BIGINT) AS qty
      |      FROM lineitem WHERE l_discount > 0.05),
      |e AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
      |SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(qty) AS BIGINT) AS sum_qty, avg(qty) AS avg_qty
      |FROM e GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------- q74_lateral
  // Correlated LATERAL subquery (top-1 order per customer) through the
  // SQL front end — Catalyst decorrelates the per-row LIMIT into a
  // ranked window join rather than executing a loop.
  private def q74Lateral(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("graft_customer")
    Tables.orders(s, d).createOrReplaceTempView("graft_orders")
    s.sql(
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM graft_customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM graft_orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |ORDER BY c_custkey""".stripMargin)
  }

  private val q74Sql =
    """SELECT c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
      |ORDER BY c_custkey""".stripMargin

  // ----------------------------------------------------- q75_topk_agg
  // Native bounded-heap top-k per group vs the oracle's window idiom:
  // the aggregate shuffles ≤ k rows per (key, partition) with map-side
  // combine, where row_number() shuffles and sorts the whole fact.
  private def q75TopKAgg(s: SparkSession, d: String): DataFrame =
    graft.functions.NativeTopK.topKPerGroup(
      Tables.orders(s, d), Seq("o_orderpriority"),
      col("o_totalprice"), col("o_orderkey"), 5,
      sortName = "o_totalprice", idName = "o_orderkey")
      .orderBy(col("o_orderpriority"), col("rank"))

  private val q75Sql =
    """SELECT o_orderpriority, CAST(rank AS INT) AS rank,
      |  o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
      |  FROM orders)
      |WHERE rank <= 5 ORDER BY o_orderpriority, rank""".stripMargin

  // ------------------------------------------------ q76_weighted_sample
  // A-Res weighted sampling (prob ∝ n_chars) per source, on the
  // bounded-heap aggregate; the per-id uniform is a Knuth multiplicative
  // hash in exact integer arithmetic, identical across engines.
  private def q76WeightedSample(s: SparkSession, d: String): DataFrame =
    CorpusOps.weightedSample(
      Tables.documents(s, d), "doc_id", "source", "n_chars", k = 5)
      .orderBy(col("source"), col("rank"))

  private val q76Sql =
    """WITH keyed AS (
      |  SELECT doc_id, source,
      |    round(ln((((((doc_id % 2147483648 + 2147483648) % 2147483648)
      |                * 2654435761) % 4294967296) + 1) / 4294967297.0)
      |          / n_chars, 6) AS sample_key
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id, sample_key,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY sample_key DESC, doc_id) AS rank
      |  FROM keyed)
      |SELECT source, CAST(rank AS INT) AS rank, doc_id, sample_key
      |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q62_repetition", q62Repetition, Some(q62Sql)),
    Q("q63_boilerplate", q63Boilerplate, Some(q63Sql)),
    Q("q64_sliding_window", q64Sliding, Some(q64Sql)),
    Q("q65_strat_sample", q65Sample, Some(q65Sql)),
    Q("q66_full_outer", q66FullOuter, Some(q66Sql)),
    Q("q67_quantize", q67Quantize, Some(q67Sql)),
    Q("q68_jaccard_pairs", q68Jaccard, Some(q68Sql)),
    Q("q69_embed_neardup", q69EmbedNearDup, Some(q69Sql)),
    Q("q70_span_dedup", q70SpanDedup, Some(q70Sql)),
    Q("q71_moments", q71Moments, Some(q71Sql)),
    Q("q72_editdist", q72EditDist, Some(q72Sql)),
    Q("q73_setops_all", q73SetopsAll, Some(q73Sql)),
    Q("q138_setop_sums", q138SetopSums, Some(q138Sql)),
    Q("q74_lateral", q74Lateral, Some(q74Sql)),
    Q("q75_topk_agg", q75TopKAgg, Some(q75Sql)),
    Q("q76_weighted_sample", q76WeightedSample, Some(q76Sql)),
  )
}

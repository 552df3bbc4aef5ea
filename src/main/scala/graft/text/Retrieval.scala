package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval scoring — the ranking half of the
  * retrieve-and-filter loops an LLM-data pipeline runs (hard-negative
  * mining, dedup-aware retrieval, eval-set contamination probes) when
  * embeddings are too expensive or too blunt.
  *
  * Execution shape for a 100 TB corpus:
  *  - ONE tokenize+aggregate pass computes, per document, its length and
  *    its term frequency for every query term (term list is a literal —
  *    the tf columns are conditional sums, no pivot, no second scan);
  *  - document frequencies and the corpus averages reduce that per-doc
  *    table (already ~|corpus| rows, not |tokens|) to one broadcast row;
  *  - scoring is pure per-row arithmetic, and the final top-k is a
  *    TakeOrderedAndProject — no global sort materializes.
  * The per-term score sum is written as an explicit left-to-right `+`
  * chain and every division/multiplication keeps one fixed sequence, so
  * the doubles are bit-reproducible across engines — q136 hash-matches a
  * DuckDB oracle mirroring the same IEEE op order.
  *
  * Uses the Robertson/Lucene idf form `ln((N − df + 0.5)/(df + 0.5) + 1)`
  * (always ≥ 0, no negative-idf clamp needed).
  */
object Retrieval {

  /** Whitespace tokens of `lower(text)`, empties dropped — the same
    * definition the oracle uses (`string_split_regex(lower(text),'\s+')`). */
  private[text] def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "\\s+"), t => t =!= "")

  /** BM25 scores for `terms` against every document; returns the top `k`
    * as (doc_id-named idCol, score) with score rounded to 6 decimals and
    * ties broken by id. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "terms: non-empty, unique")
    val id = col(idCol)

    // pass 1 (the only corpus-wide pass): per-doc length + per-term tf
    val tok = docs.select(id, explode(tokens(col(textCol))).as("t"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("t") === t, 1L).otherwise(0L)).as(s"tf$i")
    }
    val perDoc = tok.groupBy(id)
      .agg(count(lit(1)).as("len"), tfCols: _*)

    // corpus constants: one row, broadcast back onto the per-doc table
    val dfCols = terms.indices.map { i =>
      sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")
    }
    val gAggs = Seq(
      count(lit(1)).as("n"),
      (sum(col("len")).cast("double") / count(lit(1))).as("avglen")) ++ dfCols
    val globals = perDoc.agg(gAggs.head, gAggs.tail: _*)

    val scored = perDoc.crossJoin(broadcast(globals))
    // idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen)), summed in
    // term order as an explicit + chain (bit-stable, unlike SUM over an
    // unpivoted set whose order the engine chooses)
    val termScores: Seq[Column] = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val dfT = col(s"df$i").cast("double")
      val idf = graft.functions.NativeMath.strictLn(
        (col("n").cast("double") - dfT + 0.5) / (dfT + 0.5) + 1.0)
      // lit(1.0 - b) / lit(k1 + 1.0): folded in Scala; the oracle spells
      // the same arithmetic (`1.0 - 0.75`, `1.2 + 1.0`) so both engines
      // hold bit-identical constants
      val den = tf + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("len").cast("double") / col("avglen"))
      when(col(s"tf$i") > 0, idf * (tf * lit(k1 + 1.0)) / den)
        .otherwise(lit(0.0))
    }
    val score = termScores.reduceLeft(_ + _)
    // filter on the RAW score, round only for output: the oracle's WHERE
    // binds to the unrounded CTE column, so filtering the rounded value
    // would drop a doc with 0 < score < 5e-7 that the oracle keeps
    scored.select(id, score.as("raw"))
      .filter(col("raw") > 0.0)
      .select(id, round(col("raw"), 6).as("score"))
      .orderBy(col("score").desc, id)
      .limit(k)
  }

  /** Batch BM25: score a query TABLE against the corpus in ONE corpus
    * pass — the retrieval-for-mining shape (hard-negative mining,
    * contamination probes over thousands of eval prompts) where
    * re-scanning the corpus per query would be quadratic in practice.
    *
    * `queries` holds (query_id: long, term: string, pos: int) with
    * `pos < arity` and one row per query term; all terms of a query must
    * be distinct. Returns the top `k` docs per query as
    * (query_id, idCol, score), ties broken by id.
    *
    * Execution shape:
    *  - one tokenize pass builds the (doc, term, tf) table; per-doc
    *    lengths and per-term document frequencies RE-AGGREGATE that
    *    compacted table (its exchange is reused — the corpus parquet is
    *    scanned once, which the plan audit pins);
    *  - the query table and the query-term document frequencies are
    *    broadcast; only (doc, term) rows matching some query term
    *    survive into scoring, so the per-doc-length join shuffles the
    *    matched slice, not the corpus;
    *  - per (query, doc), the score is an explicit `+` chain over the
    *    query's term POSITIONS: each position's conditional sum has at
    *    most one non-zero contribution (adding 0.0 is IEEE-exact), so
    *    the chain is bit-reproducible regardless of row order across
    *    1000 executors — the same determinism trick as the literal-term
    *    scorer, lifted to a dynamic query set;
    *  - top-k per query is one window over the scored candidates.
    */
  def bm25Batch(docs: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int, arity: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(arity > 0, "arity: the max terms per query, > 0")
    val id = col(idCol)

    // The explicit isnotnull filters are LOAD-BEARING: every consumer of
    // `tf` below must build the byte-identical subtree, or the exchange
    // backing it is not reused and the corpus is scanned once per
    // consumer. Constraint inference would otherwise add isnotnull(id) /
    // isnotnull(t) only to the branches that JOIN on those columns,
    // de-canonicalizing the copies — stating them up front keeps all
    // three branches identical (the plan audit pins the single scan).
    val tok = docs.filter(id.isNotNull)
      .select(id, explode(tokens(col(textCol))).as("t"))
      .where(col("t").isNotNull)
    val tf = tok.groupBy(id, col("t")).agg(count(lit(1)).as("tf"))
    // doc length = Σ tf over the doc — derived from the compacted table,
    // never a second pass over raw tokens
    val lens = tf.groupBy(id).agg(sum(col("tf")).as("len"))
    val globals = lens.agg(count(lit(1)).as("n"),
      (sum(col("len")).cast("double") / count(lit(1))).as("avglen"))
    // df spelled as sum(tf > 0) rather than count(*): counting rows would
    // let column pruning strip `tf` from this branch's copy of the
    // aggregate (degenerating it to a distinct), which de-canonicalizes
    // the subtree and forfeits the exchange reuse — and it mirrors the
    // literal scorer's df definition anyway
    val dfs = tf.groupBy(col("t"))
      .agg(sum(when(col("tf") > 0, 1L).otherwise(0L)).as("df"))
    // df rows for query terms only — small enough to broadcast. An INNER
    // join against the distinct term list (not a semi) because the
    // optimizer pushes semi-joins through aggregates, which would
    // specialize this branch's tf subtree and break the exchange reuse
    val dfq = dfs.join(
      broadcast(queries.select(col("term")).distinct()),
      dfs("t") === col("term"))
      .select(dfs("t").as("dft"), col("df"))

    val matched = tf
      .join(broadcast(queries), tf("t") === queries("term"))
      .join(broadcast(dfq), tf("t") === col("dft"))
      .join(lens, Seq(idCol))
      .crossJoin(broadcast(globals))

    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val idf = graft.functions.NativeMath.strictLn(
      (col("n").cast("double") - dfD + 0.5) / (dfD + 0.5) + 1.0)
    val den = tfD + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("len").cast("double") / col("avglen"))
    val ts = idf * (tfD * lit(k1 + 1.0)) / den

    // one conditional sum per query position; each has ≤1 non-zero term
    val posSums = (0 until arity).map { p =>
      sum(when(col("pos") === p, ts).otherwise(lit(0.0))).as(s"s$p")
    }
    val perQueryDoc = matched.groupBy(col("query_id"), id)
      .agg(posSums.head, posSums.tail: _*)
    val score = (0 until arity).map(p => col(s"s$p")).reduceLeft(_ + _)

    // bounded-heap top-k (NativeTopK, the q23 discipline): the window
    // idiom re-exchanged EVERY scored (query, doc) row by query_id and
    // sorted it (profiled 20.9 MB through that exchange at sf0.1) just
    // to keep k rows; the heap aggregate keeps ≤ k per (query,
    // partition) before the exchange — same (raw DESC, id ASC) total
    // order, same rounded output (guide §2.3 shuffle fewer bytes).
    graft.functions.NativeTopK.topKPerGroup(
      perQueryDoc.select(col("query_id"), id, score.as("raw")),
      Seq("query_id"), col("raw"), id, k,
      sortName = "raw", idName = idCol)
      .select(col("query_id"), id, round(col("raw"), 6).as("score"))
      .orderBy(col("query_id"), col("score").desc, id)
  }

  /** INDEX-ROUTED HYBRID RETRIEVAL: the BM25 + cosine reciprocal-rank
    * fusion (RRF, `Σ sides 1/(rrfK + rank)` at the standard k=60)
    * served entirely from PERSISTED indexes — the corpus is never
    * scanned:
    *
    *  - the LEXICAL leg reads the inverted index at `textIndexDir`
    *    ([[InvertedIndex.search]] — Bloom-pruned posting files, exact
    *    df from the pruned slice, the bit-identical BM25 chain);
    *  - the VECTOR leg reads the IVF index at `vecIndexDir`
    *    ([[graft.sim.IvfIndex.candidatesPersisted]] — Bloom-pruned
    *    probe cells), scoring candidates on the 6-DECIMAL-ROUNDED
    *    cosine with an id tiebreak: the exact rank rule the raw
    *    brute-force twin uses, so with `nProbe` = the index's cell
    *    count the routed result EQUALS the corpus-scan fusion
    *    bit for bit (HybridRoutedSpec pins it; q197 shares q194's
    *    DuckDB oracle). Fewer probes trade recall for serving cost —
    *    the ANN dial, unchanged.
    *
    * `termQueries` holds (query_id, term, pos); `vecQueries` holds
    * (vecIdCol, vecCol) per query. Returns (query_id, doc_id, rank,
    * rrf) — rrf rounded to 6 decimals, which cannot flip a rank: at
    * k=60 with leg ranks ≤ k, distinct rank sets differ by ≥ 1e-4.
    *
    * At 100 TB this is the serving shape: both legs open only the
    * files their Blooms admit, the fusion is a top-k-sized full outer
    * join, and nothing re-tokenizes or re-embeds the corpus. */
  def hybridTopK(spark: SparkSession, textIndexDir: String,
      vecIndexDir: String, termQueries: DataFrame, vecQueries: DataFrame,
      vecIdCol: String, vecCol: String, k: Int, arity: Int,
      nProbe: Int, rrfK: Int = 60,
      /** Drop the vector-leg hit whose doc id EQUALS the query id —
        * correct ONLY when queries ARE corpus vectors sharing the
        * corpus id space (the self-join twin convention q194/q197
        * use, where a query trivially retrieves itself). OFF by
        * default: with an independent query id space the "self" match
        * is a legitimate document that happens to share the number,
        * and excluding it would silently skew RRF ranks.
        *
        * BEHAVIOR CHANGE (round 15): earlier versions excluded
        * id-equal hits UNCONDITIONALLY. A caller that relied on the
        * old implicit exclusion must now pass `excludeSelf = true`
        * explicitly — with the flag left false, self-hits appear in
        * the fused ranking. Every in-repo call site was updated; the
        * flip is called out here because it is invisible at old call
        * sites. */
      excludeSelf: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // lexical leg: top-k per query from the posting index, re-ranked on
    // the rounded score exactly as the corpus-scan twin ranks
    val idCol = graft.sources.CommitLog.latest(spark, textIndexDir)
      .getOrElse(throw new IllegalArgumentException(
        s"$textIndexDir holds no index commit log"))
      .props.getOrElse("bm25.id_col", throw new IllegalStateException(
        s"$textIndexDir carries no bm25 props"))
    val t = InvertedIndex.search(spark, textIndexDir, termQueries, k, arity)
      .withColumn("trank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col(idCol))))
      .select(col("query_id"), col(idCol).as("doc_id"), col("trank"))
    // vector leg: probed candidates scored on round(cosine, 6) with an
    // id tiebreak — the brute-force twin's exact rank rule
    val (assigned, probes) = graft.sim.IvfIndex.candidatesPersisted(
      spark, vecIndexDir, vecQueries, vecIdCol, vecCol, nProbe)
    val scored0 = assigned.join(probes, Seq("cell"))
    val scored = (if (excludeSelf)
      scored0.filter(col("query_id") =!= col("nn_id")) else scored0)
      .select(col("query_id"), col("nn_id").as("neighbor_id"),
        round(graft.sim.Similarity.cosine(col("qv"), col("nn_vec")), 6)
          .as("sim6"))
    val v = graft.functions.NativeTopK.topKPerGroup(
      scored, Seq("query_id"), col("sim6"), col("neighbor_id"), k,
      sortName = "sim6", idName = "neighbor_id")
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("vrank"))
    // RRF fusion: a top-k-sized full outer join, absent legs score 0
    t.join(v, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("trank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("vrank")), lit(0.0)))
          .as("rrf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"),
        round(col("rrf"), 6).as("rrf"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** INDEX-ROUTED HARD-NEGATIVE MINING: the top-BM25-minus-positives
    * recipe (contrastive-retriever training data — random negatives
    * are too easy; top-ranked non-answers teach the margin) served
    * from the persisted inverted index, never the corpus. Candidates
    * are the index's top-`k` per query ([[InvertedIndex.search]] —
    * Bloom-pruned postings, the bit-identical BM25 chain), `positives`
    * (query_id, doc_id — broadcast-sized label table) anti-join away,
    * survivors re-rank 1..`negK`. Output: (query_id, negative_id,
    * neg_rank, score). Scores are bit-equal to the corpus-scan mine
    * (q199 shares q195's DuckDB oracle verbatim), so routing is free
    * correctness-wise — and at 100 TB it is the only affordable shape:
    * the corpus-scan twin re-tokenizes everything per mining run. */
  /** HYBRID hard-negative mining: negatives mined from the RRF-FUSED
    * candidate ranking ([[hybridTopK]] — Bloom-pruned postings + the
    * IVF-probed vector cells), not the lexical leg alone. This is the
    * variant whose candidate generation RIDES THE nProbe DIAL: an
    * embedding-similar non-answer that BM25 never surfaces (paraphrase
    * negatives — the hardest kind for a dense retriever) enters the
    * candidate set through the vector leg, so reduced probes can cost
    * mined-set recall, and q203 gates that operating point the way
    * q197 gates fused retrieval. ([[hardNegatives]], by contrast, is
    * probe-INSENSITIVE by construction: its candidates come from the
    * postings index only — no vector leg exists in its path, which is
    * that verb's documented waiver.) `positives` anti-join away after
    * fusion; survivors re-rank 1..`negK` by fused rank. Output:
    * (query_id, negative_id, neg_rank, rrf). */
  def hardNegativesHybrid(spark: SparkSession, textIndexDir: String,
      vecIndexDir: String, termQueries: DataFrame, vecQueries: DataFrame,
      vecIdCol: String, vecCol: String, positives: DataFrame,
      k: Int, arity: Int, nProbe: Int, negK: Int, rrfK: Int = 60,
      excludeSelf: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    hybridTopK(spark, textIndexDir, vecIndexDir, termQueries, vecQueries,
      vecIdCol, vecCol, k, arity, nProbe, rrfK, excludeSelf)
      .join(broadcast(positives), Seq("query_id", "doc_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("rank"))))
      .filter(col("neg_rank") <= negK)
      .select(col("query_id"), col("doc_id").as("negative_id"),
        col("neg_rank"), col("rrf"))
      .orderBy(col("query_id"), col("neg_rank"))
  }

  def hardNegatives(spark: SparkSession, textIndexDir: String,
      termQueries: DataFrame, positives: DataFrame,
      k: Int, arity: Int, negK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idCol = graft.sources.CommitLog.latest(spark, textIndexDir)
      .getOrElse(throw new IllegalArgumentException(
        s"$textIndexDir holds no index commit log"))
      .props.getOrElse("bm25.id_col", throw new IllegalStateException(
        s"$textIndexDir carries no bm25 props"))
    InvertedIndex.search(spark, textIndexDir, termQueries, k, arity)
      .withColumn("trank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col(idCol))))
      .withColumnRenamed(idCol, "doc_id")
      .join(broadcast(positives), Seq("query_id", "doc_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("trank"))))
      .filter(col("neg_rank") <= negK)
      .select(col("query_id"), col("doc_id").as("negative_id"),
        col("neg_rank"), col("score"))
      .orderBy(col("query_id"), col("neg_rank"))
  }
}

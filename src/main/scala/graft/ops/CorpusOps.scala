package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines: deterministic
  * splits, token-budget sequence packing, and benchmark decontamination.
  * All pure Catalyst expressions / relational ops — each scales as one
  * projection, one bounded window, or one broadcast join.
  */
object CorpusOps {

  // ------------------------------------------------ bigram LM scoring
  /** Adjacent-token (doc, w1, w2) pairs via one lead() window per doc —
    * checkpointed LAZILY (eager = false), because every consumer (count
    * tables + the scoring join) references the pair table several times
    * and Spark would re-execute the tokenize+window subtree per
    * reference; lazy keeps DataFrame construction job-free (Explain
    * stays a no-op) while still materializing once at first action. */
  private def bigramPairs(df: DataFrame, idCol: String, textCol: String,
      tokenize: Column => Column): DataFrame = {
    val tok = df.select(col(idCol),
        posexplode(tokenize(col(textCol))).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    tok
      .withColumn("w2", lead(col("term"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col(idCol), col("term").as("w1"), col("w2"))
      .localCheckpoint(eager = false)
  }

  /** CCNet-style language-model quality scoring: train a bigram MLE model
    * on the corpus itself, then score every document by its mean bigram
    * log-probability. Templated/repetitive text scores near 0 (its
    * bigrams dominate the corpus); rare-junk text scores very negative.
    * Every scored bigram was observed at least once (the model is trained
    * on the same corpus), so the MLE ratio c(w1,w2)/c(w1,·) needs no
    * smoothing and P ≤ 1 always.
    *
    * Bigrams are kept as separate (w1, w2) columns throughout — no key
    * concatenation, so `tokenize` may emit any token content. Returns
    * (id, n_bigrams, lm_score); documents with < 2 tokens have no
    * bigrams and are absent.
    *
    * Shape: adjacency comes from ONE lead() window per document (no
    * positional self-join); the count tables shuffle (w1, w2) pairs —
    * bounded by corpus token count, and Zipf-skewed first tokens
    * (stopwords) are exactly what AQE's skew-join split is for. The
    * per-doc reduce is an avg of ln values absorbed to 6 dp.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
      tokenize: Column => Column): DataFrame = {
    val pairs = bigramPairs(df, idCol, textCol, tokenize)
    val cb = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val cu = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    pairs.join(cb, Seq("w1", "w2")).join(cu, Seq("w1"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(graft.functions.NativeMath.strictLn(
          col("c2").cast("double") / col("c1").cast("double"))), 6)
          .as("lm_score"))
      .orderBy(col(idCol))
  }

  /** Collocation mining via pointwise mutual information over adjacent
    * token pairs: PMI = ln(c(w1,w2)·N / (c(w1,·)·c(·,w2))), min-count
    * pruned BEFORE the marginal joins, top-k under a total order
    * (rounded PMI desc, then the pair). High-PMI pairs are the
    * corpus's multiword expressions; the classic collocation detector.
    *
    * Shape: the checkpointed pair table feeds three aggregations; the
    * grand total is a 1-row broadcast; all joins key on vocabulary
    * tables (Zipf-bounded relative to the corpus).
    */
  def collocationsPmi(df: DataFrame, idCol: String, textCol: String,
      tokenize: Column => Column, minCount: Long = 5L,
      k: Int = 50): DataFrame = {
    val pairs = bigramPairs(df, idCol, textCol, tokenize)
    val cb = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val cu1 = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val cu2 = pairs.groupBy(col("w2")).agg(count(lit(1)).as("cc2"))
    // global count straight off the pair table — summing cb would rerun
    // the (w1, w2) shuffle just to produce one scalar
    val total = pairs.agg(count(lit(1)).as("total"))
    cb.filter(col("c2") >= minCount)
      .join(cu1, Seq("w1")).join(cu2, Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c2"),
        round(graft.functions.NativeMath.strictLn(
          col("c2").cast("double") * col("total") /
          (col("c1").cast("double") * col("cc2"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  // ------------------------------------------------- deterministic split
  /** Content-stable train/val/test assignment from a hash of the id —
    * reproducible across runs, machines, and engines (md5 is everywhere),
    * and adding documents never reassigns existing ones (unlike
    * `randomSplit`, which reshuffles with the partition layout).
    *
    * The first two md5 hex chars give 256 buckets; split by lexicographic
    * threshold: < 'cd' → train (205/256 ≈ 80%), < 'e6' → val (≈ 10%),
    * else test. Zero shuffles — a codegen'd projection.
    */
  def deterministicSplit(
      df: DataFrame, idCol: String,
      trainKey: String = "cd", valKey: String = "e6"): DataFrame = {
    val key = substring(md5(col(idCol).cast("string")), 1, 2)
    df.withColumn("bucket_key", key)
      .withColumn("split",
        when(col("bucket_key") < trainKey, "train")
          .when(col("bucket_key") < valKey, "val")
          .otherwise("test"))
  }

  // -------------------------------------------------- sequence packing
  /** Concat-and-chunk sequence packing: documents are laid out in
    * (partition, id) order and cut into fixed token-budget packs —
    * `pack_id` = which training sequence a document starts in. The
    * running offset is a bounded window (partitioned by `partCol`, e.g.
    * shard or source), NOT a global cumsum: each partition packs
    * independently, so the window never funnels 100 TB through one task.
    */
  def packSequences(
      df: DataFrame, idCol: String, tokenCountCol: Column,
      partCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", tokenCountCol)
      .withColumn("pack_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("pack_offset") / budget).cast("long"))
  }

  // ----------------------------------------------------- vocabulary
  /** Tokenizer-vocabulary construction: term → (total count, doc
    * frequency), min-count pruned, deterministically ordered (count desc,
    * term asc — a total order, so `limit` is reproducible). One explode +
    * one partial+final aggregation; the shuffle carries (term, partial
    * counts), never documents. */
  def vocabulary(
      df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5L, maxSize: Int = 100000): DataFrame =
    df.select(col(idCol), explode(graft.text.TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"), count_distinct(col(idCol)).as("n_docs"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("term"))
      .limit(maxSize)

  /** Per-document top-k terms by tf·idf. `idfScaled` = (1e6·N) div df in
    * exact integer arithmetic — a monotone transform of N/df, chosen so
    * ranking (and the cross-engine oracle compare) never depends on
    * floating-point log rounding; `tfidf` carries the conventional
    * tf·ln(N/df) double for consumers. Doc-frequency table is
    * aggregated (|vocab| rows) then joined back — broadcast-sized for
    * any real vocabulary. */
  def tfidfTopTerms(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val n = df.count()
    val tf = df
      .select(col(idCol), explode(graft.text.TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count_distinct(col(idCol)).as("df"))
      .withColumn("idf_scaled", expr(s"${1000000L * n}L div df"))
    val scored = tf.join(broadcast(dfreq), Seq("term"))
      .withColumn("score_scaled", col("tf") * col("idf_scaled"))
      .withColumn("tfidf", col("tf") *
        graft.functions.NativeMath.strictLn(lit(n.toDouble) / col("df")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score_scaled").desc, col("term"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // -------------------------------------------------------- chunking
  /** Split documents into overlapping token windows (the embedding /
    * context-window prep step): window `chunkTokens` wide, stride
    * `chunkTokens - overlap`. One generate+explode projection per doc —
    * no shuffle; output order is (doc, chunk_idx) deterministic. The
    * final window may be shorter (slice clamps); empty docs yield one
    * empty chunk rather than disappearing. */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    val toks = split(trim(col(textCol)), "\\s+")
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(1), greatest(size(col("__toks")), lit(1)), lit(step)),
          i => concat_ws(" ", slice(col("__toks"), i, lit(chunkTokens)))))
          .as(Seq("chunk_idx", "chunk")))
      .withColumn("n_chunk_tokens", size(split(col("chunk"), " ")))
  }

  // ------------------------------------------------- repetition signals
  /** Gopher-style within-document repetition signals: duplicate-token
    * fraction, top-token fraction, and duplicate-2-gram fraction — the
    * standard cheap filters for degenerate/looping text. EVERY signal —
    * including the top-token count, via the sorted-array longest-run
    * identity — is a pure array expression over the scan, so the whole
    * operator is shuffle-free at any corpus size (per-row cost bounded
    * by the document's own token count, the same bound the tokenize
    * already has). */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = graft.text.TextAnalysis.tokens(lower(col(textCol)))
    val g2 = when(size(col("__t")) >= 2,
      transform(sequence(lit(1), size(col("__t")) - 1),
        i => concat_ws(" ", element_at(col("__t"), i), element_at(col("__t"), i + 1))))
      .otherwise(array().cast("array<string>"))
    // top-token count map-side: equal tokens are adjacent in the sorted
    // array, so max term frequency = the longest equal-run. Replaces the
    // explode → (id, term) count → (id) max → join-back scaffold (three
    // exchanges of the exploded token set) with a per-row expression —
    // the whole operator is then a single scan projection (guide §2.3
    // shuffle fewer bytes / §2.4 remove shuffles outright). The sorted
    // array is a MATERIALIZED column (__st): referencing array_sort
    // inside the fold's lambda would re-sort per element — O(n² log n)
    // per document, measured 20× slower. `get` is 0-based and the
    // sequence stays within [1, size-1], so no ANSI out-of-bounds path
    // exists; the run/best counters reproduce the exploded count
    // exactly (they count the same multiset).
    val st = col("__st")
    val topCount = coalesce(
      when(size(col("__t")) <= 1, size(col("__t")).cast("long"))
        .otherwise(aggregate(
          sequence(lit(1), size(col("__t")) - 1),
          struct(lit(1L).as("run"), lit(1L).as("best")),
          (acc, j) => {
            val run = when(get(st, j) === get(st, j - 1),
              acc.getField("run") + 1L).otherwise(lit(1L))
            struct(run.as("run"),
              greatest(acc.getField("best"), run).as("best"))
          },
          acc => acc.getField("best"))),
      lit(0L))
    val base = df.select(col(idCol), t.as("__t"))
      .select(col(idCol), col("__t"), g2.as("__g"),
        array_sort(col("__t")).as("__st"))
      .select(col(idCol),
        size(col("__t")).cast("long").as("total_tokens"),
        size(array_distinct(col("__t"))).cast("long").as("distinct_tokens"),
        size(col("__g")).cast("long").as("total_2grams"),
        size(array_distinct(col("__g"))).cast("long").as("distinct_2grams"),
        topCount.as("top_count"))
    base
      .withColumn("dup_token_frac",
        when(col("total_tokens") > 0,
          lit(1.0) - col("distinct_tokens").cast("double") / col("total_tokens"))
          .otherwise(0.0))
      .withColumn("top_token_frac",
        when(col("total_tokens") > 0,
          col("top_count").cast("double") / col("total_tokens")).otherwise(0.0))
      .withColumn("dup_2gram_frac",
        when(col("total_2grams") > 0,
          lit(1.0) - col("distinct_2grams").cast("double") / col("total_2grams"))
          .otherwise(0.0))
  }

  // ------------------------------------------------- boilerplate grams
  /** Cross-document repeated n-grams — boilerplate/template detection
    * (headers, license banners, nav chrome). Emits grams seen in at
    * least `minDocs` distinct documents with doc + occurrence counts.
    *
    * Each document's gram multiset is run-length encoded MAP-SIDE (equal
    * grams are adjacent in the sorted array), so every (doc, gram) pair
    * crosses as ONE row carrying its in-doc count: `count(DISTINCT
    * doc_id)` degenerates to a plain `count(*)` and `count(*)` to
    * `sum(cnt)` — one partially-aggregated exchange keyed on gram,
    * instead of the distinct-aggregate's Expand (2× the exploded rows)
    * plus two exchanges (guide §2.3 shuffle fewer bytes). At 100 TB the
    * same pipeline runs over gram *hashes* ([[contaminatedDocs]]
    * pattern) — text grams are kept here because the operator's product
    * is a human-readable boilerplate list. */
  def boilerplateGrams(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Long = 3L, maxSize: Int = 100): DataFrame = {
    val t = graft.text.TextAnalysis.tokens(lower(col(textCol)))
    val grams = transform(sequence(lit(1), size(col("__t")) - (n - 1)),
      i => concat_ws(" ", slice(col("__t"), i, lit(n))))
    // run starts in the sorted gram array (0-based; `get` returns null
    // out of bounds, so j-1 at j=0 short-circuits through the OR) →
    // one (gram, in-doc count) struct per distinct gram of the doc
    val sorted = col("__sorted")
    val starts = filter(sequence(lit(0), size(sorted) - 1),
      j => (j === 0) || (get(sorted, j) =!= get(sorted, j - 1)))
    val rle = transform(col("__starts"), (s, j) =>
      struct(
        get(sorted, s).as("gram"),
        (coalesce(get(col("__starts"), j + 1), size(sorted)) - s)
          .as("cnt")))
    df.select(col(idCol), t.as("__t"))
      .filter(size(col("__t")) >= n)
      .select(col(idCol), array_sort(grams).as("__sorted"))
      .select(col(idCol), sorted, starts.as("__starts"))
      .select(explode(rle).as("__rg"))
      .select(col("__rg.gram").as("gram"), col("__rg.cnt").as("cnt"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"), sum(col("cnt")).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("gram"))
      .limit(maxSize)
  }

  // ------------------------------------------------- stratified sample
  /** Deterministic exact-fraction stratified sample: within each stratum,
    * rank rows by md5(id) (a content-stable pseudo-random order — same
    * engine-portable trick as [[deterministicSplit]]) and keep the first
    * ceil(frac·n). Reproducible across runs/engines, and exact per-stratum
    * fractions unlike Bernoulli `df.sample`. One shuffle (window by
    * stratum); a stratum's rows must fit a task — true for any real
    * source/shard stratification, and the Bernoulli path covers the rest. */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String, frac: Double): DataFrame = {
    val order = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val whole = Window.partitionBy(col(stratumCol))
    df.withColumn("rn", row_number().over(order).cast("long"))
      .withColumn("n_stratum", count(lit(1)).over(whole))
      .filter(col("rn") <= ceil(col("n_stratum") * frac))
  }

  // ------------------------------------------------------- span dedup
  /** Sub-document (chunk-level) exact dedup, CCNet-style: cut documents
    * into non-overlapping token chunks, keep only the FIRST occurrence of
    * each distinct chunk across the corpus (first = min (doc, chunk_idx)
    * — a total order, so reproducible), and reassemble each document
    * from its surviving chunks. Removes cross-document boilerplate spans
    * that whole-doc dedup can't see. Two shuffles, both inherent to
    * cross-doc content matching: one on the chunk content key (groups =
    * occurrence lists, tiny), one back on the doc id; at 100 TB the
    * content key is the md5 shown here (fixed 16 bytes, never the chunk
    * text). */
  def dedupSpans(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 32): DataFrame = {
    val chunks = chunkDocuments(df, idCol, textCol, chunkTokens, overlap = 0)
    val w = Window.partitionBy(md5(col("chunk")))
      .orderBy(col(idCol), col("chunk_idx"))
    chunks.withColumn("occ", row_number().over(w))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("occ") === 1, lit(1))).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("occ") === 1, struct(col("chunk_idx"), col("chunk"))))),
          s => s.getField("chunk"))).as("clean_text"))
  }

  // ---------------------------------------------------- weighted sample
  /** Weighted sampling without replacement (Efraimidis–Spirakis A-Res),
    * distributed: each row gets key = ln(u)/w (u a deterministic
    * per-id uniform, w the weight column) and the k largest keys per
    * stratum win — selection probability ∝ weight. The top-k runs on
    * the bounded-heap aggregate, so the shuffle carries ≤ k rows per
    * (stratum, partition) at any corpus size. u comes from a Knuth
    * multiplicative hash in exact integer arithmetic — reproducible
    * across runs AND engines (no RNG state, no float hash); keys are
    * rounded to 6dp before ranking so libm's last-ulp ln() differences
    * can't flip an order across engines. Ids are folded to [0, 2^31)
    * via pmod before the multiply, so any BIGINT id — including
    * negative hash surrogates — stays inside the ANSI-checked
    * arithmetic and yields u in (0, 1]. */
  def weightedSample(
      df: DataFrame, idCol: String, stratumCol: String, weightCol: String,
      k: Int): DataFrame = {
    val u = (((pmod(col(idCol).cast("long"), lit(2147483648L)) * 2654435761L)
      % 4294967296L + 1)
      .cast("double") / 4294967297.0)
    val key6 = round(
      graft.functions.NativeMath.strictLn(u) / col(weightCol), 6)
    graft.functions.NativeTopK.topKPerGroup(
      df.withColumn("__key6", key6), Seq(stratumCol),
      col("__key6"), col(idCol), k,
      sortName = "sample_key", idName = idCol)
  }

  // -------------------------------------------------------- PII masking
  /** Structure-preserving PII scrub: emails → <EMAIL>, long digit runs
    * (phone-shaped) → <PHONE>. ASCII character classes only, so Java and
    * RE2 regex engines agree; a pure codegen'd projection. */
  def maskPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "[\\w.+-]+@[\\w.-]+\\.\\w+", "<EMAIL>"),
      "\\+?\\d[\\d()\\s-]{7,}\\d", "<PHONE>")

  // ----------------------------------------------------- decontamination
  /** Benchmark decontamination: training documents that share ≥1 word
    * n-gram with the (small) eval set, with the count of distinct shared
    * grams. The eval gram set broadcasts (eval benchmarks are KBs–MBs);
    * the train side streams through one codegen'd explode + hash join —
    * no shuffle of the corpus. Documents with < n tokens can't carry an
    * n-gram and are excluded on both sides.
    */
  /** (id, gram_h) rows: xxhash64 of each word n-gram of documents with
    * ≥ n tokens. 8-byte keys instead of ~40-char gram strings — the
    * shared primitive of batch decontamination and the streaming
    * contamination guard (collision odds ~2⁻⁶⁴ per pair, absorbed into
    * both consumers' contracts). */
  def gramHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.filter(size(split(trim(lower(col(textCol))), "\\s+")) >= n)
      .select(col(idCol),
        explode(graft.functions.NativeHashes.shingleHashes(col(textCol), n)).as("gram_h"))

  def contaminatedDocs(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val evalGrams = gramHashes(eval, idCol, textCol, n).select(col("gram_h")).distinct()
    gramHashes(train, idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("gram_h"))
      .select(col(idCol), col("gram_h")).distinct()
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }
}

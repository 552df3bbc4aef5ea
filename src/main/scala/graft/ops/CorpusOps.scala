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
      .withColumn("tfidf", col("tf") * log(lit(n.toDouble) / col("df")))
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
  def contaminatedDocs(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    // join on xxhash64 of the gram, not the gram text: the broadcast set
    // and the per-row probe keys are 8 bytes instead of ~40-char strings
    // (collision odds ~2⁻⁶⁴ per pair — absorbed into the method's
    // contract; flagged docs are candidates for review either way)
    def gramHashes(df: DataFrame): DataFrame =
      df.filter(size(split(trim(lower(col(textCol))), "\\s+")) >= n)
        .select(col(idCol),
          explode(graft.functions.NativeHashes.shingleHashes(col(textCol), n)).as("gram_h"))
    val evalGrams = gramHashes(eval).select(col("gram_h")).distinct()
    gramHashes(train)
      .join(broadcast(evalGrams), Seq("gram_h"))
      .select(col(idCol), col("gram_h")).distinct()
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }
}

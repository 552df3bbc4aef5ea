package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.CorpusOps
import graft.text.TextAnalysis

/** End-to-end training-corpus preparation pipeline — the composed form
  * of the operator library, in the order production pipelines run it:
  *
  *   language filter → exact dedup → near dedup (MinHash-LSH + cluster
  *   resolution) → span dedup (cross-doc chunk boilerplate) →
  *   decontamination vs an eval set → quality filter → deterministic
  *   split → token-budget sequence packing.
  *
  * Every stage is one of the individually oracle-checked operators;
  * this job only composes them, so the pipeline inherits their scale
  * properties (no stage collects, no stage shuffles more than its
  * operator documents). Each stage is materialized (localCheckpoint)
  * before it is counted, so the audit runs every stage exactly once —
  * lazy plans would re-execute the whole prefix for every count and
  * again for the final pack.
  */
object CorpusPipeline {

  final case class Report(
      input: Long, afterLang: Long, afterExact: Long, afterNear: Long,
      afterSpan: Long, afterDecontam: Long, afterQuality: Long)

  final case class Config(
      keepLangs: Set[String] = Set("en"),
      nearDupThreshold: Double = 0.6,
      spanChunkTokens: Int = 32,
      contaminationNgram: Int = 5,
      minQuality: Double = 0.25,
      packBudget: Int = 2048)

  /** Run the full pipeline. Returns the packed corpus (doc_id, text,
    * lang_pred, quality, split, n_tokens, pack_offset, pack_id) and the
    * per-stage row accounting.
    *
    * Lifetime: only the LAST stage's checkpoint (which backs the
    * returned plan) outlives the call. Every earlier stage — and any
    * checkpoint an operator parks internally while a stage builds (the
    * near-dup machinery keeps a candidate-pair table and a shingle
    * table) — is retired as soon as the next stage's eager checkpoint
    * has materialized.
    */
  def run(docs: DataFrame, evalSet: DataFrame,
      cfg: Config = Config()): (DataFrame, Report) = {
    val sc = docs.sparkSession.sparkContext
    var prevStage: DataFrame = null
    // Checkpoint one stage, then unpersist (a) every RDD that became
    // persistent during the build except the stage's own checkpoint and
    // (b) the previous stage's checkpoint — the new one is
    // self-contained. The before-snapshot keeps caller-owned caches
    // (e.g. a cached `docs`) out of reach.
    def stage(build: => DataFrame): DataFrame = {
      val before = sc.getPersistentRDDs.keySet
      val out = build.localCheckpoint()
      val keep = graft.runtime.Lifetime.checkpointRdds(out).map(_.id).toSet
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id) && !keep.contains(id)) rdd.unpersist(false)
      }
      if (prevStage != null) graft.runtime.Lifetime.release(prevStage)
      prevStage = out
      out
    }
    val input = docs.count()

    // language ID — native single-pass expression
    val lang = stage(docs
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .filter(col("lang_pred").isin(cfg.keepLangs.toSeq: _*)))
    val nLang = lang.count()

    // exact dedup (normalized-content key, min-id keeper)
    val exact = stage(Dedup.dropExactDups(lang, "doc_id", "text"))
    val nExact = exact.count()

    // near dedup: LSH pairs → connected components → one keeper/cluster
    val near = stage(Dedup.dropNearDups(exact, "doc_id", "text",
      threshold = cfg.nearDupThreshold))
    val nNear = near.count()

    // span dedup: drop cross-doc repeated chunks, reassemble docs
    val span = stage(
      CorpusOps.dedupSpans(near, "doc_id", "text", cfg.spanChunkTokens)
        .filter(length(col("clean_text")) > 0)
        .join(near.drop("text"), Seq("doc_id"))
        .withColumnRenamed("clean_text", "text")
        .drop("n_chunks", "n_kept"))
    val nSpan = span.count()

    // decontamination: drop docs sharing ≥1 n-gram with the eval set
    val decontam = stage {
      val contaminated = CorpusOps.contaminatedDocs(
        span, evalSet, "doc_id", "text", cfg.contaminationNgram)
        .select(col("doc_id"))
      span.join(contaminated, Seq("doc_id"), "left_anti")
    }
    val nDecontam = decontam.count()

    // quality floor
    val quality = stage(decontam
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .filter(col("quality") >= cfg.minQuality))
    val nQuality = quality.count()

    // split + pack. Packing windows by the bare 3-value split would
    // funnel ~the whole train split through one window task; pack within
    // (split, hash shard) instead — each shard packs independently,
    // which is also the layout a data-parallel trainer consumes.
    val packed = CorpusOps.packSequences(
      CorpusOps.deterministicSplit(quality, "doc_id")
        .withColumn("pack_shard", concat_ws("/", col("split"),
          pmod(xxhash64(col("doc_id")), lit(64)).cast("string"))),
      "doc_id", TextAnalysis.tokenCount(col("text")).cast("long"),
      "pack_shard", cfg.packBudget)
      .select(col("doc_id"), col("text"), col("lang_pred"), col("quality"),
        col("split"), col("pack_shard"), col("n_tokens"),
        col("pack_offset"), col("pack_id"))

    (packed, Report(input, nLang, nExact, nNear, nSpan, nDecontam, nQuality))
  }

  /** Publish gate: assert the packed corpus's structural invariants with
    * the declarative audit ([[graft.ops.Constraints]]) before anything
    * downstream consumes it — unique doc ids, no null text/split, quality
    * inside [minQuality, 1]. Throws with the full failing report if any
    * check trips; returns the input unchanged otherwise. The report is
    * one row per check, so the collect is bounded by the check count. */
  def publishGate(packed: DataFrame, minQuality: Double): DataFrame = {
    import graft.ops.Constraints._
    val report = audit(packed, Seq(
      NotNull("text"), NotNull("split"), NotNull("pack_id"),
      Unique(Seq("doc_id")),
      Bounds("quality", minQuality, 1.0)))
    val failing = report.filter(!col("pass")).collect()
    if (failing.nonEmpty)
      throw new IllegalStateException(
        "corpus failed its publish audit: " + failing.mkString("; "))
    packed
  }

  /** Publish the gated corpus into a LOGGED lake: one atomic
    * [[graft.sources.CommitLog]] commit (keyed by doc_id, partitioned
    * by split, zone-map stats on doc_id from birth), so downstream
    * trainers read a SNAPSHOT — never a half-published corpus — old
    * versions stay time-travelable until vacuum, and incremental
    * consumers diff versions with changesBetween. Returns the committed
    * snapshot and the corpus datasheet ([[graft.ops.CorpusCard]])
    * computed from exactly the published state. A re-publish of a
    * refreshed corpus is just the next version: only the partitions
    * whose docs changed are rewritten. */
  def publishLogged(packed: DataFrame, minQuality: Double,
      lakeDir: String): (graft.sources.CommitLog.Snapshot, DataFrame) = {
    val gated = publishGate(packed, minQuality)
    val snap = graft.sources.CommitLog.upsertOrCreate(
      gated.sparkSession, gated, lakeDir,
      keyCols = Seq("doc_id"), partitionCol = "split",
      statsCols = Seq("doc_id"))
    val published = graft.sources.CommitLog.read(gated.sparkSession, lakeDir)
    (snap, graft.ops.CorpusCard.build(published, langCol = "lang_pred"))
  }
}

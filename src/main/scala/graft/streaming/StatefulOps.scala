package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.TextAnalysis

/** Custom streaming state (SURVEY.md §2.8's KeyValueGroupedDataset
  * mapping): arbitrary per-key state beyond windowed aggregation.
  * State lives in the checkpointed state store — per-key, partitioned,
  * nothing driver-side — so it scales with executor count like any
  * keyed stream.
  */
object StatefulOps {

  final case class EquipmentUpdate(equipment: String, vehicles: Long)
  final case class EquipmentTotal(equipment: String, totalVehicles: Long, batches: Long)

  /** Streaming exact dedup for a document ingest stream: keep the first
    * arrival of each content fingerprint; later copies arriving within
    * the watermark delay are dropped. State is the fingerprint (8 bytes)
    * keyed in the state store and EVICTED once the watermark passes —
    * bounded by arrival rate × delay, unlike `dropDuplicates`, whose
    * key state grows forever and cannot survive an unbounded corpus.
    * (The batch path's exact dedup is [[graft.dedup.Dedup.exactDups]];
    * this is its at-ingest streaming twin.) */
  def dedupedDocStream(
      docs: DataFrame, tsCol: String, textCol: String,
      delay: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_fp", TextAnalysis.contentFingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_fp")

  /** Streaming unique visitors per tumbling window — the streaming twin
    * of [[graft.ops.AnalyticsOps.cumulativeDistinct]]'s batch reduction.
    * Dedup first (one state row per (entity, window)), THEN count: a
    * windowed count(DISTINCT) isn't supported in streaming, and counting
    * raw events would tally visits, not visitors. Append mode — each
    * window emits once, when the watermark closes it.
    *
    * The watermark delay is `windowMinutes + graceMinutes`, NOT the
    * grace alone: dropDuplicatesWithinWatermark only guarantees dedup
    * of copies arriving within the delay of the first, so dedup state
    * must outlive the whole window plus allowed lateness — with a
    * shorter delay, two same-window visits farther apart than the delay
    * would both survive and the window would double-count the entity.
    * (Every admitted — non-late — duplicate of a window event arrives
    * while the watermark is below win_end + grace ≤ first_visit +
    * delay, so the state is still there.) Cost: windows close
    * `windowMinutes` later than with a bare-grace watermark.
    */
  def uniqueVisitors(
      events: DataFrame, tsCol: String, entityCol: String,
      windowMinutes: Int = 60, graceMinutes: Int = 30): DataFrame = {
    require(windowMinutes > 0 && graceMinutes >= 0, "bad window/grace")
    val win = s"$windowMinutes minutes"
    events
      .withWatermark(tsCol, s"${windowMinutes + graceMinutes} minutes")
      .select(col(entityCol), col(tsCol),
        org.apache.spark.sql.functions.window(col(tsCol), win)
          .getField("start").as("win_start"))
      // one survivor per (entity, window); the event-time column rides
      // along so the downstream aggregation re-windows from it
      .dropDuplicatesWithinWatermark(entityCol, "win_start")
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), win))
      .agg(count(lit(1)).as("unique_visitors"))
      .select(col("window.start").as("window_start"),
        col("unique_visitors"))
  }

  /** Streaming decontamination guard: flag arriving documents that share
    * ≥1 word n-gram with a STATIC eval-benchmark set. The eval gram-hash
    * table is a static DataFrame — Spark broadcasts it into every
    * micro-batch (stream-static equi-join, no stream state at all), so
    * the check adds one codegen'd explode + hash probe per arriving doc.
    * Emits one `(idCol, gram_h)` row per matched gram in append mode —
    * deliberately NOT aggregated per document, because a streaming
    * groupBy would reintroduce watermarked state; downstream consumers
    * count per id in their own batch sink if they need totals. Batch
    * twin is [[graft.ops.CorpusOps.contaminatedDocs]]. */
  def contaminationAlerts(
      docs: DataFrame, evalSet: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    // same gram construction as the batch path — one definition to change
    val evalGrams = graft.ops.CorpusOps.gramHashes(evalSet, idCol, textCol, n)
      .select(col("gram_h")).distinct()
    graft.ops.CorpusOps.gramHashes(docs, idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("gram_h"))
      .select(col(idCol), col("gram_h"))
  }

  /** Stream-stream interval join: pair each purchase with the same
    * user's clicks from the preceding `lookback`. BOTH sides are
    * watermarked and the join condition bounds event time on both
    * sides, so Spark can evict buffered rows once the watermark passes
    * — state is arrival-rate × (delay + lookback) per side, never
    * unbounded. The equi-key (user_id) partitions the join; the range
    * condition prunes within the key's buffered rows. */
  def purchasesWithRecentClicks(
      purchases: DataFrame, clicks: DataFrame,
      delay: String = "30 minutes", lookback: String = "15 minutes"): DataFrame = {
    val p = purchases
      .withColumnsRenamed(Map("ts" -> "p_ts", "event_id" -> "purchase_id"))
      .withWatermark("p_ts", delay)
    val c = clicks
      .withColumnsRenamed(Map("ts" -> "c_ts", "event_id" -> "click_id"))
      .withWatermark("c_ts", delay)
    p.join(c,
      p("user_id") === c("user_id") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookback"))
      .select(p("user_id"), col("purchase_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
  }

  /** Running per-equipment totals across micro-batches via
    * flatMapGroupsWithState — emits one updated total per key per batch. */
  def runningTotals(
      spark: SparkSession,
      updates: Dataset[EquipmentUpdate]): Dataset[EquipmentTotal] = {
    import spark.implicits._
    updates
      .groupByKey(_.equipment)
      .flatMapGroupsWithState[EquipmentTotal, EquipmentTotal](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[EquipmentUpdate], state: GroupState[EquipmentTotal]) =>
          val add = rows.map(_.vehicles).sum
          val prev = state.getOption.getOrElse(EquipmentTotal(key, 0L, 0L))
          val next = EquipmentTotal(key, prev.totalVehicles + add, prev.batches + 1)
          state.update(next)
          Iterator.single(next)
      }
  }

  final case class BandedDoc(id: Long, ts: java.sql.Timestamp,
      sig: Array[Long], band: Int, bucket: Long)
  final case class BucketEntry(id: Long, tsMs: Long, sig: Array[Long])
  final case class BucketState(entries: List[BucketEntry])
  final case class NearDupAlert(id: Long, ts: java.sql.Timestamp,
      dup_of: Long, sim: Double)

  /** Streaming NEAR-duplicate detection — the at-ingest twin of
    * [[graft.dedup.Dedup.nearDupPairsMinhash]]: flag each arriving
    * document that is a MinHash near-dup of one seen in the previous
    * `delayMinutes`. Emits one (id, ts, dup_of, sim) row per detected
    * (newer, older) pair, deduplicated across bands.
    *
    * Shape is the batch LSH design re-expressed as stream state: the
    * signature explodes into `bands` bucket keys; each bucket is a
    * [[org.apache.spark.sql.streaming.GroupState]] holding the (id, ts,
    * sig) of its recent members, so an arriving document compares
    * against ONLY its bucket's members — candidate work scales with
    * bucket density exactly like the batch bucket-join, never with the
    * corpus. State is evicted two ways, both watermark-driven: entries
    * older than the horizon are pruned on every bucket visit, and idle
    * buckets clear wholesale via event-time timeout — the store is
    * bounded by arrival-rate × horizon at any stream length.
    *
    * Cross-band dedup is LOCAL, not a second stateful operator (Spark's
    * correctness check rightly refuses a stateful dedup downstream of
    * flatMapGroupsWithState): a colliding pair is emitted only by the
    * FIRST band on which the two signatures fully agree — both sigs are
    * in hand, so that band is computable wherever the pair meets, and
    * every other shared bucket sees it isn't first and stays silent.
    *
    * `sim` is SIGNATURE agreement (matching minhash positions / k), the
    * standard unbiased Jaccard estimate — not the exact-Jaccard rescore
    * the batch path does, which would require every bucket to retain
    * full shingle sets in state; callers needing exactness verify the
    * tiny alert stream against stored text downstream. With the default
    * k=64 the estimate's σ is ≈0.06 at the 0.6 threshold.
    *
    * In-order delivery within a key: rows in a batch process in (ts,
    * id) order, and a pair is reported once, attributed to the LATER
    * document. A document arriving after its bucket state was evicted
    * (beyond the horizon) simply starts fresh — by design, the horizon
    * IS the dedup contract, same as [[dedupedDocStream]].
    */
  def nearDupAlerts(
      docs: DataFrame, idCol: String, tsCol: String, textCol: String,
      delayMinutes: Int = 60, n: Int = 3, k: Int = 64, bands: Int = 16,
      simThreshold: Double = 0.6): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    require(delayMinutes > 0, "delayMinutes must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPer = k / bands
    val delayStr = s"$delayMinutes minutes"
    val delayMs = delayMinutes * 60000L
    val banded = docs
      .filter(col(idCol).isNotNull && col(tsCol).isNotNull &&
        col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        graft.functions.NativeHashes.minhashSig(col(textCol), n, k).as("sig"))
      .withWatermark("ts", delayStr)
      .select(col("id"), col("ts"), col("sig"),
        posexplode(graft.dedup.Dedup.bandKeys(col("sig"), bands, rowsPer))
          .as(Seq("band", "bucket")))
      .as[BandedDoc]
    // smallest band on which the two signatures agree over the whole
    // rowsPer-slice — the single band allowed to report the pair
    def firstMatchingBand(a: Array[Long], b: Array[Long]): Int = {
      var j = 0
      while (j < bands) {
        var r = 0
        while (r < rowsPer && a(j * rowsPer + r) == b(j * rowsPer + r)) r += 1
        if (r == rowsPer) return j
        j += 1
      }
      -1
    }
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, NearDupAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          val wm = state.getCurrentWatermarkMs()
          var entries = state.getOption.map(_.entries).getOrElse(Nil)
            .filter(e => e.tsMs + delayMs >= wm)
          val out = List.newBuilder[NearDupAlert]
          if (!state.hasTimedOut) {
            rows.toSeq.sortBy(r => (r.ts.getTime, r.id)).foreach { r =>
              entries.foreach { e =>
                if (e.id != r.id && firstMatchingBand(r.sig, e.sig) == r.band) {
                  var eq = 0
                  var i = 0
                  while (i < r.sig.length) {
                    if (r.sig(i) == e.sig(i)) eq += 1
                    i += 1
                  }
                  val sim = eq.toDouble / r.sig.length
                  if (sim >= simThreshold)
                    out += NearDupAlert(r.id, r.ts, e.id, sim)
                }
              }
              entries = BucketEntry(r.id, r.ts.getTime, r.sig) :: entries
            }
          }
          if (entries.isEmpty) state.remove()
          else {
            state.update(BucketState(entries))
            // strictly above the watermark or Spark rejects the timeout
            state.setTimeoutTimestamp(
              math.max(entries.map(_.tsMs).max + delayMs, wm + 1))
          }
          out.result().iterator
      }
      .toDF()
  }

  final case class FunnelEvent(user_id: Long, event_type: String,
      ts: java.sql.Timestamp)
  final case class FunnelState(stage: Int, stageMs: Long)
  final case class FunnelConversion(user_id: Long, stage: Int, step: String,
      ts: java.sql.Timestamp)

  /** Streaming twin of [[graft.ops.AnalyticsOps.funnel]]: per-user stage
    * progression tracked across micro-batches, one `FunnelConversion`
    * emitted the moment a user first reaches each stage. Matches the
    * batch semantics (strict `>` ordering between consecutive stage
    * timestamps, millisecond granularity) for in-order streams; an
    * event arriving in a LATER batch than a same-user event it precedes
    * in event time is ignored rather than retro-fitted — state is one
    * (stage, ts) pair per user, so the store stays O(users) regardless
    * of event volume. Rows within a batch are processed in (ts,
    * event_type) order so intra-batch multi-stage advancement works.
    */
  def funnelProgress(
      spark: SparkSession,
      events: Dataset[FunnelEvent],
      stages: Seq[String]): Dataset[FunnelConversion] = {
    import spark.implicits._
    require(stages.nonEmpty, "funnelProgress needs at least one stage")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelConversion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = Seq.newBuilder[FunnelConversion]
          rows.toSeq.sortBy(r => (r.ts.getTime, r.event_type)).foreach { r =>
            if (st.stage < stages.length && r.event_type == stages(st.stage) &&
                (st.stage == 0 || r.ts.getTime > st.stageMs)) {
              st = FunnelState(st.stage + 1, r.ts.getTime)
              out += FunnelConversion(user, st.stage, r.event_type, r.ts)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}

package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (Apache DataSketches HLL, surfaced by
  * Spark's `hll_sketch_agg` / `hll_union_agg` since 3.5) — the 100 TB
  * answer to "how many distinct X per group, re-aggregated along any
  * rollup path".
  *
  * Why sketches and not `count(DISTINCT …)`: exact distinct is a full
  * shuffle of every distinct value per group, and it does NOT
  * re-aggregate — a per-partition exact count cannot be combined into a
  * global one, so every new rollup grain rescans the fact. An HLL sketch
  * is a fixed ≤ ~2^lgK-byte summary that (a) aggregates with map-side
  * combine (sketch bytes shuffle, not values), (b) unions without
  * re-scanning — a merged estimate stays inside the sketch's configured
  * error bound no matter how the data was grouped (SketchSpec; NOT
  * bit-identical to a directly-built sketch: sparse-mode sketches
  * promote differently under different groupings) — and (c) can be persisted per partition in the lake, so later
  * cardinality queries merge kilobytes per partition instead of
  * rescanning terabytes. This is the same carry/re-agg design as the
  * histogram operator (SURVEY §2 A3), applied to distinct counts.
  *
  * Mirrors the reference's completeness-audit need (distinct equipment /
  * day coverage, `/root/reference/src/verify_dates.py`) at a scale where
  * exact distinct is unaffordable.
  */
object Sketches {

  /** Per-key HLL sketch of `of`'s distinct values (binary column). */
  def sketchBy(df: DataFrame, of: Column, lgConfigK: Int, keys: Column*): DataFrame =
    df.groupBy(keys: _*).agg(hll_sketch_agg(of, lit(lgConfigK)).as("sketch"))

  /** Roll sketches up to a coarser grain: union then estimate. The input
    * is a sketch table (e.g. persisted per ingest partition); no raw data
    * is touched. */
  def rollup(sketches: DataFrame, estimateAs: String, keys: Column*): DataFrame = {
    val merged = hll_union_agg(col("sketch"), lit(false))
    sketches.groupBy(keys: _*)
      .agg(hll_sketch_estimate(merged).cast("long").as(estimateAs))
  }

  // --------------------------------------------------------- quantiles
  /** Per-key KLL(k) quantile sketch of `of` (binary column `sketch`) —
    * the percentile analog of [[sketchBy]]: fixed-size, mergeable,
    * persistable. Build once per lake partition; answer any later
    * percentile rollup from the sketches alone. */
  def quantileSketchBy(df: DataFrame, of: Column, k: Int, keys: Column*): DataFrame =
    df.groupBy(keys: _*)
      .agg(graft.functions.NativeSketches.kllAgg(of, k).as("sketch"))

  /** Roll quantile sketches up to a coarser grain: merge, then estimate
    * the `ranks` quantiles as array column `estimateAs`. No raw data is
    * touched — kilobytes of sketch per input group. The merged estimate
    * carries the SAME rank-error bound as a directly-built sketch
    * (KLL's merge guarantee), verified in QuantileSketchSpec. */
  def quantileRollup(sketches: DataFrame, ranks: Seq[Double],
      estimateAs: String, k: Int, keys: Column*): DataFrame = {
    import graft.functions.NativeSketches.{kllMerge, kllQuantiles}
    sketches.groupBy(keys: _*)
      .agg(kllMerge(col("sketch"), k).as("__merged"))
      .withColumn(estimateAs, kllQuantiles(col("__merged"), ranks))
      .drop("__merged")
  }

  // ------------------------------------------------------ heavy hitters
  /** EXACT heavy hitters — every `item` value occurring in ≥ `weightFrac`
    * of the rows — in two bounded passes, never a full-cardinality
    * shuffle:
    *
    *  1. one Misra-Gries aggregate (fixed `maxMapSize` state, map-side
    *     combine) yields a guaranteed SUPERSET of the true heavy hitters
    *     (NO_FALSE_NEGATIVES) plus the exact stream length — the
    *     candidate list is ≤ maxMapSize rows, a sanctioned driver-side
    *     collect;
    *  2. one exact count of ONLY the candidates (broadcast isin filter →
    *     tiny groupBy), thresholded at weightFrac · n.
    *
    * Output: (item, cnt), cnt exact, ordered cnt DESC then item. This is
    * the 100 TB answer to "which tokens/domains dominate the corpus":
    * `groupBy(item).count` over a billion-cardinality column shuffles
    * everything; this shuffles sketch bytes + one bounded candidate set.
    * The threshold comparison is `cnt >= weightFrac * n` in DOUBLE, the
    * same IEEE expression the DuckDB oracle evaluates (q144). */
  def exactHeavyHitters(df: DataFrame, item: Column, weightFrac: Double,
      maxMapSize: Int = 1024): DataFrame = {
    import graft.functions.NativeSketches.freqCandidates
    val firstPass = df.agg(
      freqCandidates(item, maxMapSize, weightFrac).as("cand"),
      count(item).as("n")).head()
    val n = firstPass.getLong(1)
    val cands = firstPass.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val out = df.select(item.as("item")).filter(col("item").isNotNull)
    if (cands.isEmpty || n == 0L)
      out.groupBy(col("item")).agg(count(lit(1)).as("cnt")).limit(0)
    else
      out.filter(col("item").isInCollection(cands))
        .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt").cast("double") >= lit(weightFrac) * lit(n.toDouble))
        .orderBy(col("cnt").desc, col("item"))
  }

  /** Distinct-cardinality rollup demo over `documents`: sketch at the
    * (source, lang) grain, merge to per-source, alongside the exact
    * distinct for visible error. Two-level on purpose — the second level
    * aggregates SKETCHES, exercising the persist-then-merge path. */
  def distinctDocsBySource(docs: DataFrame, lgConfigK: Int = 12): DataFrame = {
    val fine = sketchBy(docs, col("doc_id"), lgConfigK, col("source"), col("lang"))
    val est = rollup(fine, "est_distinct", col("source"))
    val exact = docs.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("exact_distinct"))
    est.join(exact, Seq("source"))
      .select(col("source"), col("exact_distinct"), col("est_distinct"))
      .orderBy(col("source"))
  }
}

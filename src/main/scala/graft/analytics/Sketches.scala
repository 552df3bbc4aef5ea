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

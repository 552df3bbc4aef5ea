package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on edge DataFrames. Connected components
  * (dedup cluster resolution) live in [[graft.dedup]]; here: PageRank.
  *
  * Scale shape: one iteration = one shuffle join (edges ⋈ ranks on src)
  * plus one aggregation (contributions by dst) — the standard
  * Pregel-as-joins layout. Iterations run as a driver loop over
  * DataFrames with a `localCheckpoint` per round so the plan (and its
  * lineage) doesn't grow exponentially with iteration count.
  *
  * Determinism: ranks are BIGINT micro-units (`scale` = 1.0), every
  * per-iteration op is integer (`div` floor division, integer sums) —
  * no floating-point accumulation order anywhere, so the result is
  * bit-identical across partitionings AND engines (the q107 oracle
  * unrolls the same integer recurrence in SQL). Floor-div leaks a few
  * units of probability mass per node per iteration; rank ORDER is
  * unaffected, which is what PageRank is for.
  */
object GraphOps {

  /** `iters` rounds of PageRank (damping 0.85) over a directed edge list.
    * Every node must appear as a src at least once (add reverse edges or
    * self-loops upstream for dangling nodes — integer teleport handles
    * in-degree-0 nodes natively via the left join). Returns
    * (node, rank) with rank in units of `scale` (initial mass =
    * scale div N per node).
    */
  def pageRankInt(edges: DataFrame, src: String, dst: String,
      iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "pageRankInt needs at least one iteration")
    // materialize the degree-annotated edge list once — every iteration
    // probes it, and without the checkpoint each round would recompute
    // the caller's full upstream (e.g. a fact-table join + distinct)
    // from scratch; pre-joining outdeg leaves ONE join per iteration
    val raw = edges.select(col(src).cast("long").as("src"),
      col(dst).cast("long").as("dst"))
    val e = raw
      .join(raw.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint()
    val n = nodes.count()
    val base = scale / n // Long floor division, same as SQL `div`
    var ranks = nodes.withColumn("rank", lit(base))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inmass"))
      ranks = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(15L * base / 100L) +
            expr("(85 * coalesce(inmass, 0L)) div 100")).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}

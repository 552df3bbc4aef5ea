package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Model

/** Analytics over the pre-binned speed histograms — the query surface the
  * reference's star schema exists for ("for querying and analysis",
  * /root/reference/README.md:3). The speed dimension is flattened into 11
  * integer columns (schema.sql:59-70), so re-aggregation is plain column
  * sums (map-side partial aggregation for free) and percentile extraction
  * is a statically-unrolled expression over the bins — no UDFs, fully
  * codegen'd, safe at any scale.
  */
object SpeedHistogram {

  private val bins = Model.speedBins

  /** Re-aggregate histograms by arbitrary keys: sums every bin + total.
    * sum(bins)==total is preserved by construction. */
  def aggregateBins(df: DataFrame, groupCols: Column*): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(sum(col(bins.head)).as(bins.head),
        bins.tail.map(b => sum(col(b)).as(b)) :+ sum(col("total")).as("total"): _*)

  /** Weighted mean speed (km/h) from bin midpoints; null when total==0. */
  def weightedMeanCol: Column = {
    val weighted = bins.zip(Model.binMidpoints)
      .map { case (b, m) => col(b) * lit(m) }
      .reduce(_ + _)
    when(col("total") > 0, weighted / col("total"))
  }

  /** p-th percentile speed via linear interpolation inside the first bin
    * where the cumulative count crosses p*total. Unrolled to a when-chain
    * over the 11 bins (codegen-friendly; no arrays, no UDF). */
  def percentileCol(p: Double): Column = {
    require(p > 0 && p <= 1, s"percentile must be in (0,1], got $p")
    val target = lit(p) * col("total")
    val cums = bins.scanLeft(lit(0).cast("long"))((acc, b) => acc + col(b)).tail
    val chain = bins.indices.foldRight(lit(null).cast("double")) { (i, rest) =>
      val (lo, hi) = Model.binEdges(i)
      val prevCum = if (i == 0) lit(0).cast("long") else cums(i - 1)
      val inBin = when(col(bins(i)) > 0,
        lit(lo) + (target - prevCum) / col(bins(i)) * lit(hi - lo))
      when(cums(i) >= target && col(bins(i)) > 0, inBin).otherwise(rest)
    }
    when(col("total") > 0, chain)
  }

  /** Histogram invariant check column: sum of bins equals total
    * (FIXTURES.md row invariant). */
  def invariantViolated: Column =
    bins.map(col).reduce(_ + _) =!= col("total")

  /** Per-(equipment, direction, day) rollup with mean + p85 speed — the
    * flagship analytics view. */
  def dailyProfile(flows: DataFrame): DataFrame =
    aggregateBins(flows, col("equipment"), col("direction"), col("pubdate"))
      .withColumn("mean_speed", weightedMeanCol)
      .withColumn("p85_speed", percentileCol(0.85))

  /** Top-k busiest (equipment, time-slot) pairs by total flow. */
  def topKBusiest(flows: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val slotTotals = flows.groupBy(col("equipment"), col("initial_time"))
      .agg(sum(col("total")).as("slot_total"))
    val w = Window.partitionBy(col("equipment"))
      .orderBy(col("slot_total").desc, col("initial_time").asc)
    slotTotals.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}

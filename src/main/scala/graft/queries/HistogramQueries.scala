package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.analytics.SpeedHistogram
import graft.model.Model
import graft.tables.Tables

/** Puts the radar histogram analytics under the DuckDB oracle: lineitem
  * quantities are binned into the engine's 11 speed buckets, then the
  * exact same weighted-mean / interpolated-percentile expressions used by
  * [[graft.analytics.SpeedHistogram]] run on top — with the arithmetic
  * mirrored operation-for-operation in SQL so doubles match bit-for-bit.
  * Also: skew-salted join (same result as the plain join, plan spreads a
  * hot key across 4 salt buckets) and the approximate-aggregate family.
  */
object HistogramQueries {

  // ------------------------------------------------------ q43_histogram
  private def q43Histogram(s: SparkSession, d: String): DataFrame = {
    val binAggs = Model.binEdges.zip(Model.speedBins).map { case ((lo, hi), name) =>
      sum(when(col("l_quantity").between(lo, hi), 1).otherwise(0)).as(name)
    }
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(binAggs.head, binAggs.tail :+ count(lit(1)).as("total"): _*)
      .withColumn("mean_speed", round(SpeedHistogram.weightedMeanCol, 6))
      .withColumn("p85", round(SpeedHistogram.percentileCol(0.85), 6))
      .select(col("l_returnflag"), col("total"), col("mean_speed"), col("p85"))
      .orderBy(col("l_returnflag"))
  }

  private val q43Sql = {
    val bins = Model.binEdges.zipWithIndex.map { case ((lo, hi), i) =>
      s"CAST(sum(CASE WHEN l_quantity BETWEEN $lo AND $hi THEN 1 ELSE 0 END) AS BIGINT) AS b$i"
    }.mkString(",\n    ")
    val mean = Model.binMidpoints.zipWithIndex
      .map { case (m, i) => s"b$i * $m" }.mkString(" + ")
    val cum = (i: Int) => (0 to i).map(j => s"b$j").mkString(" + ")
    val cases = Model.binEdges.zipWithIndex.map { case ((lo, hi), i) =>
      val prev = if (i == 0) "0" else cum(i - 1)
      s"WHEN (${cum(i)}) >= 0.85 * total AND b$i > 0 THEN $lo + (0.85 * total - ($prev)) / b$i * ${(hi - lo).toDouble}"
    }.mkString("\n      ")
    s"""WITH h AS (
       |  SELECT l_returnflag,
       |    $bins,
       |    count(*) AS total
       |  FROM lineitem GROUP BY 1)
       |SELECT l_returnflag, total,
       |  round(CASE WHEN total > 0 THEN ($mean) / total END, 6) AS mean_speed,
       |  round(CASE WHEN total > 0 THEN
       |    CASE
       |      $cases
       |    END END, 6) AS p85
       |FROM h ORDER BY l_returnflag""".stripMargin
  }

  // ----------------------------------------------------- q44_approx_agg
  // HLL count-distinct + quantile sketches (deterministic given the data;
  // sketch internals differ from DuckDB's, so rows-only check). The
  // exact-distinct control column is computed as an explicit two-level
  // aggregation and joined back: mixing count_distinct with the sketch
  // aggs in one agg makes Catalyst Expand every input row per distinct
  // group (2× the fact through the hash agg); the split form keeps both
  // paths single-width.
  private def q44Approx(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val sketches = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        round(percentile_approx(col("l_quantity"), lit(0.5), lit(100)), 6)
          .as("approx_p50"))
    val exact = li.groupBy(col("l_returnflag"), col("l_partkey")).agg(count(lit(1)))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_parts"))
    sketches.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("approx_parts"), col("exact_parts"),
        col("approx_p50"))
      .orderBy(col("l_returnflag"))
  }

  // ---------------------------------------------------- q45_salted_join
  // Skew pattern: fact side salted into 4 buckets, dim side replicated ×4,
  // equi-join on (key, salt) — byte-identical result to the plain join,
  // but a hot orderkey now spreads over 4 reducers.
  //
  // SHUFFLE_HASH is pinned: salting only exists for a SHUFFLED join
  // (the hot key is split across reducers), and at 100 TB the ×salts
  // replicated dim is never broadcastable anyway — but at bench scale
  // the planner's size estimate let the exploded dim slip under the
  // broadcast threshold, collecting 4·|orders| rows to the driver and
  // building a multi-million-entry hash relation there (profiled as a
  // ~1.8 s zero-stage wall gap, OPTIMIZATION_r16.md). The hint makes
  // the executed plan the one the query documents, at every scale.
  private def q45Salted(s: SparkSession, d: String): DataFrame = {
    val salts = 4
    val fact = Tables.lineitem(s, d)
      .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(salts)))
    val dim = Tables.orders(s, d)
      .withColumn("salt", explode(sequence(lit(0L), lit(salts - 1L))))
      .hint("shuffle_hash")
    fact.join(dim, col("l_orderkey") === col("o_orderkey") && fact("salt") === dim("salt"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy(col("o_orderstatus"))
  }

  private val q45Sql =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------- q60_skew_stats
  // The skew diagnostic that decides when q45's salting is warranted:
  // per-key frequency distribution of the join key. Integer sums keep
  // avg/ratio exact across engines; percentile() is Spark's exact
  // interpolated percentile ≡ DuckDB percentile_cont.
  private def q60Skew(s: SparkSession, d: String): DataFrame = {
    val freq = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("f"))
    freq.agg(
      count(lit(1)).as("n_keys"),
      max(col("f")).as("max_f"),
      round(avg(col("f")), 6).as("avg_f"),
      percentile(col("f"), lit(0.5)).as("p50_f"),
      percentile(col("f"), lit(0.99)).as("p99_f"),
      round(max(col("f")) / avg(col("f")), 6).as("skew_ratio"))
  }

  private val q60Sql =
    """WITH freq AS (SELECT l_orderkey, count(*) AS f FROM lineitem GROUP BY 1)
      |SELECT count(*) AS n_keys, max(f) AS max_f,
      |  round(avg(f), 6) AS avg_f,
      |  percentile_cont(0.5) WITHIN GROUP (ORDER BY f) AS p50_f,
      |  percentile_cont(0.99) WITHIN GROUP (ORDER BY f) AS p99_f,
      |  round(max(f) / avg(f), 6) AS skew_ratio
      |FROM freq""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q43_histogram", q43Histogram, Some(q43Sql)),
    Q("q44_approx_agg", q44Approx, None),
    Q("q45_salted_join", q45Salted, Some(q45Sql)),
    Q("q60_skew_stats", q60Skew, Some(q60Sql)),
  )
}

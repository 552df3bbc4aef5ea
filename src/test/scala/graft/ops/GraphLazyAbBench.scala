package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.runtime.Lifetime

/** Interleaved A/B for the round-17 lazy-checkpoint cut in
  * [[GraphOps]] (OPTIMIZATION_r17.md change #3): OLD = the round-16
  * shapes (eager localCheckpoint per round/level + a separate gating
  * count), NEW = the shipped lazy checkpoints whose gating count doubles
  * as the materialization. One JVM, alternating A/B/A/B…, min of 8 each
  * — the only timing methodology ambient host drift hasn't fooled
  * (STABILITY/SCALE.md discipline). Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "Test/runMain graft.ops.GraphLazyAbBench"
  */
object GraphLazyAbBench {

  /** Round-16 bfsDepths, verbatim (eager checkpoint + count per level). */
  private def bfsEager(edges: DataFrame, src: String, dst: String,
      sources: Seq[Long], maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(src).cast("long").as("s"),
      col(dst).cast("long").as("d")).localCheckpoint()
    val seed = sources.distinct.toDF("node").withColumn("depth", lit(0))
      .localCheckpoint()
    var legs: List[DataFrame] = List(seed)
    var frontier = seed
    var frontierNonEmpty = true
    var depth = 1
    while (depth <= maxDepth && frontierNonEmpty) {
      val visitedNodes = legs.map(_.select(col("node")))
        .reduce(_ unionAll _)
      val next = e.join(frontier, e("s") === frontier("node"))
        .select(col("d").as("node")).distinct()
        .join(visitedNodes, Seq("node"), "left_anti")
        .withColumn("depth", lit(depth))
        .localCheckpoint()
      frontierNonEmpty = next.count() > 0
      if (frontierNonEmpty) legs = next :: legs
      else Lifetime.release(next)
      frontier = next
      depth += 1
    }
    Lifetime.release(e)
    val out = legs.reverse.reduce(_ unionAll _).localCheckpoint()
    legs.foreach(l => Lifetime.release(l))
    out
  }

  /** Round-16 pageRankInt, verbatim (eager checkpoint per round). */
  private def pageRankEager(edges: DataFrame, src: String, dst: String,
      iters: Int, scale: Long = 1000000000000L,
      broadcastRanks: Boolean = false): DataFrame = {
    def hint(df: DataFrame): DataFrame =
      if (broadcastRanks) broadcast(df) else df
    val e = edges.select(col(src).cast("long").as("src"),
      col(dst).cast("long").as("dst"))
      .repartition(col("src"))
      .withColumn("outdeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint()
    val n = nodes.count()
    val base = scale / n
    var ranks = nodes.withColumn("rank", lit(base))
    var spentRound: DataFrame = null
    for (_ <- 1 to iters) {
      val contrib = e.join(hint(ranks), e("src") === ranks("node"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inmass"))
      ranks = nodes
        .join(hint(contrib), nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(15L * base / 100L) +
            expr("(85 * coalesce(inmass, 0L)) div 100")).as("rank"))
        .localCheckpoint()
      if (spentRound != null) Lifetime.release(spentRound)
      spentRound = ranks
    }
    Lifetime.release(e)
    Lifetime.release(nodes)
    ranks
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.functions.GraftExtensions.sessionDefaults(
      SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(fn: DataFrame => DataFrame): (Double, Long) = {
      val edges = graft.queries.TradeGraph.edges(spark, sfDir)
      val t0 = System.nanoTime()
      val out = fn(edges)
      // checksum doubles as the action and the A/B equality witness
      // (bit_xor, not sum: ANSI forbids wrapping adds)
      val sum = out.agg(expr(
        s"bit_xor(xxhash64(${out.columns.mkString(",")}))").as("h"))
        .collect().head.getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      Lifetime.releaseAll(spark, blocking = true)
      (dt, sum)
    }
    def ab(name: String, a: DataFrame => DataFrame,
        b: DataFrame => DataFrame): Unit = {
      time(a); time(b) // unmeasured cold round each
      val as = Array.newBuilder[Double]; val bs = Array.newBuilder[Double]
      var ha = 0L; var hb = 0L
      (1 to 8).foreach { _ =>
        val (da, ra) = time(a); as += da; ha = ra
        val (db, rb) = time(b); bs += db; hb = rb
      }
      require(ha == hb, s"$name A/B result mismatch: $ha vs $hb")
      val mA = as.result().min; val mB = bs.result().min
      println(f"[graph-ab] $name eager(min8)=$mA%.3f s lazy(min8)=$mB%.3f s" +
        f"  delta=${100 * (mA - mB) / mA}%.1f%%")
    }
    ab("pagerank iters=3 bcast",
      e => pageRankEager(e, "src", "dst", 3, broadcastRanks = true),
      e => GraphOps.pageRankInt(e, "src", "dst", 3, broadcastRanks = true))
    ab("bfs depth=3",
      e => bfsEager(e, "src", "dst", Seq(2L), 3),
      e => GraphOps.bfsDepths(e, "src", "dst", Seq(2L), 3))
    spark.stop()
  }
}

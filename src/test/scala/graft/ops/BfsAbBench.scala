package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.runtime.Lifetime

/** Interleaved A/B for the q127 BFS scaffold cut (round-15 verdict item
  * 3): OLD = re-checkpoint `visited ∪ next` every level + isEmpty
  * probe; NEW = accumulate checkpointed frontier legs (the shipped
  * [[GraphOps.bfsDepths]]). One JVM, alternating A/B/A/B…, min of 8
  * each — the only timing methodology ambient load hasn't fooled
  * (STABILITY/SCALE.md discipline). Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "Test/runMain graft.ops.BfsAbBench"
  */
object BfsAbBench {

  /** The round-15 scaffold, verbatim (for the A side). */
  private def bfsOld(edges: DataFrame, src: String, dst: String,
      sources: Seq[Long], maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(src).cast("long").as("s"),
      col(dst).cast("long").as("d")).localCheckpoint()
    var visited = sources.distinct.toDF("node").withColumn("depth", lit(0))
      .localCheckpoint()
    var frontier = visited
    for (depth <- 1 to maxDepth if frontier.isEmpty == false) {
      val next = e.join(frontier, e("s") === frontier("node"))
        .select(col("d").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .withColumn("depth", lit(depth))
        .localCheckpoint()
      val grown = visited.unionAll(next).localCheckpoint()
      Lifetime.release(frontier)
      Lifetime.release(visited)
      visited = grown
      frontier = next
    }
    Lifetime.release(e)
    if (frontier ne visited) Lifetime.release(frontier)
    visited
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the JVM + page cache off the measured path
    spark.range(1000000).selectExpr("sum(id)").collect()

    def run(f: (DataFrame, String, String, Seq[Long], Int) => DataFrame): (Double, Long) = {
      val edges = graft.queries.TradeGraph.edges(spark, sfDir)
      val t0 = System.nanoTime()
      val out = f(edges, "src", "dst", Seq(2L), 3)
        .groupBy(col("depth")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(1)).sum
      val dt = (System.nanoTime() - t0) / 1e9
      Lifetime.releaseAll(spark, blocking = true)
      (dt, out)
    }
    // one unmeasured round each to split cold-path effects evenly
    run(bfsOld); run(GraphOps.bfsDepths)
    val (as, bs) = (Array.newBuilder[Double], Array.newBuilder[Double])
    var rowsA = 0L; var rowsB = 0L
    (1 to 8).foreach { _ =>
      val (da, ra) = run(bfsOld); as += da; rowsA = ra
      val (db, rb) = run(GraphOps.bfsDepths); bs += db; rowsB = rb
    }
    require(rowsA == rowsB, s"A/B row mismatch: $rowsA vs $rowsB")
    val a = as.result().min; val b = bs.result().min
    println(f"[bfs-ab] old(min8)=$a%.3f s  new(min8)=$b%.3f s  " +
      f"delta=${100 * (a - b) / a}%.1f%%  rows=$rowsA")
    spark.stop()
  }
}

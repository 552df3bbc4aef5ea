package graft.runtime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.TestSpark

/** Block-manager lifetime contract (VERDICT r4 "what's wrong" #1): a
  * long-lived session running every registered query must not accumulate
  * checkpointed partitions — round 4's bench degraded 2-65× per query at
  * the tail of the run from exactly that. Iterative operators release
  * superseded rounds eagerly; the session owner reclaims the one
  * result-backing checkpoint per query via [[Lifetime.releaseAll]].
  */
class CleanStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // Generous cap on what a single query may leave behind after it is
  // fully materialized: the checkpoint(s) backing its own result (the
  // LSH near-dup family parks a pair table + a shingle table; everything
  // iterative leaves exactly its final round). A query parking more is
  // leaking rounds.
  private val maxResidentPerQuery = 4

  test("every registered query leaves ≤4 persistent RDDs; releaseAll clears to zero") {
    Lifetime.releaseAll(spark, blocking = true)
    val leaks = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      val resident = spark.sparkContext.getPersistentRDDs.size
      if (resident > maxResidentPerQuery)
        leaks += s"$name parked $resident persistent RDDs"
      Lifetime.releaseAll(spark, blocking = true)
      val after = spark.sparkContext.getPersistentRDDs.size
      if (after != 0)
        leaks += s"$name: $after persistent RDDs survived releaseAll"
    }
    assert(leaks.isEmpty, leaks.mkString("\n"))
  }

  test("pageRankInt keeps in-flight state bounded: 1 checkpoint out, 0 after release") {
    Lifetime.releaseAll(spark, blocking = true)
    val edges = spark.range(100).select(
      (col("id") % 10).as("src"), ((col("id") + 3) % 10).as("dst"))
    val ranks = graft.ops.GraphOps.pageRankInt(edges, "src", "dst", iters = 6)
    // six iterations must NOT leave six round checkpoints — superseded
    // rounds (and the edge/node scaffolding) are released as they die
    assert(spark.sparkContext.getPersistentRDDs.size == 1,
      s"expected only the final round's checkpoint, got ${spark.sparkContext.getPersistentRDDs.size}")
    assert(ranks.count() == 10) // result readable after scaffolding release
    Lifetime.release(ranks)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("bfsDepths keeps in-flight state bounded across levels") {
    Lifetime.releaseAll(spark, blocking = true)
    val edges = spark.range(50).select(
      col("id").as("src"), (col("id") + 1).as("dst"))
    val depths = graft.ops.GraphOps.bfsDepths(edges, "src", "dst",
      sources = Seq(0L), maxDepth = 8)
    assert(spark.sparkContext.getPersistentRDDs.size == 1,
      s"expected only the final visited checkpoint, got ${spark.sparkContext.getPersistentRDDs.size}")
    assert(depths.count() == 9) // node 0 plus one new node per level
    Lifetime.release(depths)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("connectedComponents releases per-round state on both execution paths") {
    Lifetime.releaseAll(spark, blocking = true)
    val spokes = spark.range(1, 40).select(lit(0L).as("u"), col("id").as("v"))
    // small-graph path (driver union-find): collected, then zero residue
    graft.dedup.Dedup.connectedComponents(spokes).count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "small-graph path must release its canonical-edge checkpoint")
    // distributed star-contraction path: only the converged round remains
    val cc = graft.dedup.Dedup.connectedComponents(spokes, smallGraphCutoff = 0L)
    assert(spark.sparkContext.getPersistentRDDs.size == 1,
      s"expected only the converged round, got ${spark.sparkContext.getPersistentRDDs.size}")
    assert(cc.count() == 40)
    Lifetime.releaseAll(spark, blocking = true)
  }

  test("CorpusPipeline retires every stage except the one backing its result") {
    Lifetime.releaseAll(spark, blocking = true)
    val docs = spark.range(60).select(col("id").as("doc_id"),
      concat(lit("the quick brown fox jumps over the lazy dog line "),
        (col("id") % 7).cast("string")).as("text"))
    val eval = spark.range(1).select(col("id").as("doc_id"),
      lit("completely unrelated evaluation text").as("text"))
    val (packed, report) = graft.jobs.CorpusPipeline.run(docs, eval)
    val resident = spark.sparkContext.getPersistentRDDs.size
    assert(resident == 1,
      s"pipeline must keep only the final stage checkpoint, got $resident")
    assert(packed.count() > 0 && report.input == 60)
    Lifetime.releaseAll(spark, blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}

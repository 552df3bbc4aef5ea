package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** [[Sketches]]: the properties that make an HLL sketch a lake-scale
  * cardinality primitive — merged estimates stay inside the sketch's
  * error bound regardless of how the data was grouped (union is
  * register-wise and commutative, but sparse-mode sketches promote
  * differently under different groupings, so merge ≡ recompute only up
  * to the configured accuracy, NOT bit-exactly), and sketch bytes
  * survive a parquet round-trip (the persist-then-merge path).
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)

  private def exactDistinct: Long =
    docs.select(countDistinct(col("doc_id"))).head().getLong(0)

  test("union of per-group sketches estimates like one global sketch") {
    val viaGroups = Sketches.rollup(
      Sketches.sketchBy(docs, col("doc_id"), 12, col("source"), col("lang")),
      "est", lit(1).as("g"))
      .select(col("est")).head().getLong(0)
    val global = docs.agg(
      hll_sketch_estimate(hll_sketch_agg(col("doc_id"), lit(12)))
        .cast("long").as("est"))
      .head().getLong(0)
    val exact = exactDistinct
    assert(math.abs(viaGroups - global).toDouble / exact <= 0.01,
      s"merge ($viaGroups) drifted >1% from recompute ($global)")
    assert(math.abs(viaGroups - exact).toDouble / exact <= 0.02,
      s"merged estimate $viaGroups vs exact $exact")
  }

  test("any grouping of the input merges to an in-bound estimate") {
    def estimate(grouping: org.apache.spark.sql.Column): Long =
      Sketches.rollup(
        Sketches.sketchBy(docs, col("doc_id"), 12, grouping.as("g")),
        "est", lit(1).as("one"))
        .select(col("est")).head().getLong(0)
    val exact = exactDistinct
    Seq(estimate(col("lang")), estimate(pmod(col("doc_id"), lit(7)))).foreach {
      est =>
        assert(math.abs(est - exact).toDouble / exact <= 0.02,
          s"split-dependent estimate $est vs exact $exact")
    }
  }

  test("error stays within 2% of exact at this cardinality (lgK=12)") {
    val rows = Sketches.distinctDocsBySource(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getLong(2).toDouble
      assert(math.abs(est - exact) / exact <= 0.02,
        s"source ${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("sketch bytes survive a parquet round-trip and still merge") {
    val dir = Files.createTempDirectory("graft_sketch_").toString
    Sketches.sketchBy(docs, col("doc_id"), 12, col("source"), col("lang"))
      .write.mode("overwrite").parquet(s"$dir/sketches")
    val reread = spark.read.parquet(s"$dir/sketches")
    val merged = Sketches.rollup(reread, "est", col("source"))
    val direct = Sketches.rollup(
      Sketches.sketchBy(docs, col("doc_id"), 12, col("source"), col("lang")),
      "est", col("source"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == d, "persisted sketches merged differently than in-memory ones")
  }

  test("the sketch aggregate combines map-side (no raw values shuffle)") {
    val plan = Sketches.sketchBy(docs, col("doc_id"), 12, col("source"))
      .queryExecution.executedPlan.toString()
    // ObjectHashAggregate runs partial (merge) + final — the exchange
    // carries sketch buffers, one per (partition, key), not doc ids
    assert(plan.contains("ObjectHashAggregate"), s"no object agg:\n$plan")
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"sketch agg lost its partial phase:\n$plan")
  }
}

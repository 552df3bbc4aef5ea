package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.NativeSketches

/** [[NativeSketches]] KLL + Misra-Gries, through the [[Sketches]] API:
  * the properties that make them lake-scale primitives —
  *
  *  - KLL: a MERGED sketch answers quantile queries within the
  *    configured normalized rank error, no matter how the data was
  *    grouped first (exact percentiles have no such merge), and sketch
  *    bytes survive a parquet round-trip (persist-then-merge);
  *  - Misra-Gries candidates: NO_FALSE_NEGATIVES — every true heavy
  *    hitter appears in the candidate set even when the stream's
  *    cardinality dwarfs the sketch's fixed map — and the deterministic
  *    [lb, ub] bounds bracket the true count;
  *  - [[Sketches.exactHeavyHitters]]: the two-pass result is EXACTLY the
  *    brute-force groupBy-count answer.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 60k doubles with a heavy right tail (x^2 over three "shards"), so
    * rank errors at high quantiles are actually exercised. */
  private def skewed = spark.range(60000)
    .select(($"id" % 3).cast("string").as("g"),
      (($"id" % 10000) * ($"id" % 10000)).cast("double").as("x"))

  /** Normalized rank of `v` in the exact distribution. */
  private def rankOf(v: Double): Double =
    skewed.filter($"x" <= v).count().toDouble / 60000.0

  test("merged per-group sketches answer quantiles within KLL(200) rank error") {
    val fine = Sketches.quantileSketchBy(skewed, $"x", 200, $"g")
    val est = Sketches.quantileRollup(fine, Seq(0.25, 0.5, 0.9, 0.99), "q", 200)
      .select($"q").head().getSeq[Double](0)
    // k=200 → ~1.65% normalized rank error (99% confidence); 3% margin
    // absorbs the randomized compaction across seeds
    Seq(0.25, 0.5, 0.9, 0.99).zip(est).foreach { case (target, v) =>
      val r = rankOf(v)
      assert(math.abs(r - target) <= 0.03,
        s"quantile($target) estimated $v at true rank $r")
    }
  }

  test("merge ≡ direct build, up to the same rank-error bound") {
    val merged = Sketches.quantileRollup(
      Sketches.quantileSketchBy(skewed, $"x", 200, $"g"),
      Seq(0.5), "q", 200)
      .select($"q").head().getSeq[Double](0).head
    val direct = skewed.agg(NativeSketches.kllAgg($"x", 200).as("s"))
      .select(NativeSketches.kllQuantiles($"s", Seq(0.5)).as("q"))
      .head().getSeq[Double](0).head
    assert(math.abs(rankOf(merged) - rankOf(direct)) <= 0.03,
      s"merged median $merged vs direct $direct diverge beyond the bound")
  }

  test("KLL sketch bytes survive a parquet round-trip and still merge") {
    val dir = Files.createTempDirectory("graft_kll_").toString
    Sketches.quantileSketchBy(skewed, $"x", 200, $"g")
      .write.parquet(s"$dir/sketches")
    val reread = spark.read.parquet(s"$dir/sketches")
    val est = Sketches.quantileRollup(reread, Seq(0.5), "q", 200)
      .select($"q").head().getSeq[Double](0).head
    assert(math.abs(rankOf(est) - 0.5) <= 0.03,
      s"round-tripped median $est at rank ${rankOf(est)}")
  }

  test("KLL aggregate combines map-side (sketch bytes shuffle, not values)") {
    val plan = Sketches.quantileSketchBy(skewed, $"x", 200, $"g")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("partial_graft_kll_agg"),
      s"no partial aggregation stage:\n$plan")
  }

  test("empty group: quantiles are null, not a crash") {
    // keyless rollup over zero sketches: one global row, null estimate
    val est = Sketches.quantileRollup(
      Sketches.quantileSketchBy(skewed.filter($"x" < -1), $"x", 200, $"g"),
      Seq(0.5), "q", 200)
    val rows = est.collect()
    assert(rows.length == 1 && rows.head.isNullAt(rows.head.fieldIndex("q")))
    val nullSketch = spark.range(1)
      .select(NativeSketches.kllQuantiles(lit(null).cast("binary"), Seq(0.5)))
    assert(nullSketch.head().isNullAt(0))
  }

  // ---------------------------------------------------- frequent items
  /** 1 planted heavy hitter (5%), 97 mid items (~0.14% each), and a
    * ~50k-cardinality tail (~2 each) — the cardinality dwarfs the
    * sketch's map, so eviction actually happens. */
  private def heavyStream = spark.range(100000)
    .select(when($"id" % 20 === 0, lit("hot"))
      .when($"id" % 7 === 1, concat(lit("mid_"), ($"id" % 97).cast("string")))
      .otherwise(concat(lit("tail_"), ($"id" % 50021).cast("string")))
      .as("item"))

  test("NO_FALSE_NEGATIVES: the planted heavy hitter always surfaces") {
    val cands = heavyStream
      .agg(NativeSketches.freqCandidates($"item", 1024, 0.04).as("c"))
      .select(explode($"c").as("r"))
      .select($"r.item", $"r.est", $"r.lb", $"r.ub")
      .as[(String, Long, Long, Long)].collect()
    val hot = cands.find(_._1 == "hot")
    assert(hot.nonEmpty,
      s"planted 5% item missing from ${cands.length} candidates")
    val (_, _, lb, ub) = hot.get
    val trueCount = 5000L
    assert(lb <= trueCount && trueCount <= ub,
      s"bounds [$lb,$ub] exclude the true count $trueCount")
  }

  test("exactHeavyHitters ≡ brute-force groupBy-count, exactly") {
    // threshold between the mid items (~140) and the tail (~2): the 97
    // mids + hot must all come back with EXACT counts
    val frac = 0.001 // 100 of 100k
    val got = Sketches.exactHeavyHitters(heavyStream, $"item", frac, 8192)
      .as[(String, Long)].collect().toSet
    val n = 100000L
    val brute = heavyStream.groupBy($"item").agg(count(lit(1)).as("cnt"))
      .filter($"cnt".cast("double") >= lit(frac) * lit(n.toDouble))
      .as[(String, Long)].collect().toSet
    assert(got == brute,
      s"two-pass diverged: missing=${(brute -- got).take(5)} " +
        s"extra=${(got -- brute).take(5)}")
    assert(got.contains(("hot", 5000L)))
    assert(got.count(_._1.startsWith("mid_")) == 97)
  }

  test("an undersized sketch fails loudly instead of missing hitters") {
    val e = intercept[Throwable] {
      Sketches.exactHeavyHitters(heavyStream, $"item", 0.0001, 64).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("raise maxMapSize"))), e.toString)
  }

  test("exactHeavyHitters on an empty input returns an empty frame") {
    val empty = heavyStream.filter(lit(false))
    assert(Sketches.exactHeavyHitters(empty, $"item", 0.01).count() == 0L)
  }

  test("freq sketch combines map-side (fixed-size state shuffles)") {
    val plan = heavyStream
      .agg(NativeSketches.freqCandidates($"item", 1024, 0.04).as("c"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("partial_graft_freq_candidates"),
      s"no partial aggregation stage:\n$plan")
  }
}

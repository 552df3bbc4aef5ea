package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Generate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[FoldCountOverReplicateRows]]: counting over EXCEPT ALL / INTERSECT
  * ALL must fold to sum(multiplicity) — no ReplicateRows Generate in the
  * optimized plan — and the folded result must be bit-identical to what
  * the un-folded plan produces (asserted by re-running every query with
  * the rule excluded via spark.sql.optimizer.excludedRules).
  */
class ReplicateRowsFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def a = Seq(1, 1, 2, 3, 3, 3, 4).toDF("k")
  private def b = Seq(1, 3, 3, 9).toDF("k")

  private def hasReplicate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case g: Generate => g }.nonEmpty

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Rows produced with the fold rule switched off — the ground truth. */
  private def baselineRows(build: => DataFrame): Seq[String] = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, FoldCountOverReplicateRows.ruleName)
    try {
      val df = build
      assert(hasReplicate(df),
        "baseline lost its Generate — excludedRules did not disable the fold")
      rows(df)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("count per key over EXCEPT ALL folds and matches the unfolded plan") {
    def q = a.exceptAll(b).groupBy($"k").agg(count(lit(1)).as("n"))
    assert(!hasReplicate(q), "fold did not fire on except-all count")
    assert(rows(q) == baselineRows(q))
    // spot-check the multiset semantics: k=1 keeps 2−1=1 copy, k=3 3−2=1
    val m = q.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m == Map(1 -> 1L, 2 -> 1L, 3 -> 1L, 4 -> 1L))
  }

  test("count per key over INTERSECT ALL folds and matches the unfolded plan") {
    def q = a.intersectAll(b).groupBy($"k").agg(count(lit(1)).as("n"))
    assert(!hasReplicate(q), "fold did not fire on intersect-all count")
    assert(rows(q) == baselineRows(q))
    val m = q.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m == Map(1 -> 1L, 3 -> 2L))
  }

  test("DISTINCT over EXCEPT ALL folds (no-count aggregate path)") {
    def q = a.exceptAll(b).distinct()
    assert(!hasReplicate(q), "fold did not fire on distinct over except-all")
    assert(rows(q) == baselineRows(q))
    assert(q.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("grouping by a subset of the setop columns still folds exactly") {
    val a2 = Seq((1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "x")).toDF("k", "v")
    val b2 = Seq((1, "x"), (2, "z")).toDF("k", "v")
    def q = a2.exceptAll(b2).groupBy($"k").agg(count(lit(1)).as("n"))
    assert(!hasReplicate(q), "fold did not fire on subset grouping")
    assert(rows(q) == baselineRows(q))
    // k=1: (1,x)×2−1 + (1,y)×1 = 2; k=2: (2,x)×2 = 2
    val m = q.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m == Map(1 -> 2L, 2 -> 2L))
  }

  test("count(*) + arithmetic over the count folds too") {
    def q = a.exceptAll(b).groupBy($"k")
      .agg((count(lit(1)) * 2 + 1).as("n2"))
    assert(!hasReplicate(q), "fold did not fire under count arithmetic")
    assert(rows(q) == baselineRows(q))
  }

  test("integral sum per key over EXCEPT ALL folds and matches the unfolded plan") {
    def q = a.exceptAll(b).groupBy($"k").agg(sum($"k").as("s"))
    assert(!hasReplicate(q), "fold did not fire on except-all integral sum")
    assert(rows(q) == baselineRows(q))
    // each surviving copy contributes k: k=1 ×1, k=2 ×2·1? — spot-check
    // against hand multiplicities (1:1, 2:2, 3:1, 4:1 copies)
    val m = q.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m == Map(1 -> 1L, 2 -> 2L, 3 -> 3L, 4 -> 4L))
  }

  test("avg folds (incl. null values) and matches the unfolded plan") {
    val a2 = Seq((1, Some(10)), (1, Some(10)), (1, Some(30)), (1, None),
      (2, None), (2, None), (3, Some(5))).toDF("k", "v")
    val b2 = Seq((1, Some(10)), (3, Some(5))).toDF("k", "v")
    def q = a2.exceptAll(b2).groupBy($"k")
      .agg(avg($"v").as("a"), count(lit(1)).as("n"))
    assert(!hasReplicate(q), "fold did not fire on except-all avg")
    assert(rows(q) == baselineRows(q))
    // k=1 survivors: (10)×1, (30)×1, (null)×1 → avg 20, n 3
    // k=2 survivors: (null)×2 → avg null (all-null group), n 2
    val m = q.collect().map(r =>
      r.getInt(0) -> ((if (r.isNullAt(1)) None else Some(r.getDouble(1))), r.getLong(2))).toMap
    assert(m == Map(1 -> ((Some(20.0), 3L)), 2 -> ((None, 2L))))
  }

  test("mixed count + sum + avg in one aggregate all fold together") {
    val a2 = Seq((1, 2), (1, 2), (1, 4), (2, 6), (2, 6)).toDF("k", "v")
    val b2 = Seq((1, 2), (2, 9)).toDF("k", "v")
    def q = a2.exceptAll(b2).groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"), avg($"v").as("a"))
    assert(!hasReplicate(q), "fold did not fire on mixed aggregates")
    assert(rows(q) == baselineRows(q))
    // k=1: copies (2)×1,(4)×1 → n=2 s=6 a=3; k=2: (6)×2 → n=2 s=12 a=6
    val m = q.collect().map(r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(m == Map(1 -> ((2L, 6L, 3.0)), 2 -> ((2L, 12L, 6.0))))
  }

  test("floating-point sum is left alone (negative case: not exactly foldable)") {
    val a2 = Seq((1, 0.1), (1, 0.1), (1, 0.1), (2, 0.5)).toDF("k", "v")
    val b2 = Seq((2, 0.5)).toDF("k", "v")
    val q = a2.exceptAll(b2).groupBy($"k").agg(sum($"v").as("s"))
    assert(hasReplicate(q),
      "double sum must keep its Generate — x+x+x and 3·x round differently")
    assert(q.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("global (ungrouped) count is left alone (negative case)") {
    val q = a.exceptAll(b).agg(count(lit(1)).as("n"))
    assert(hasReplicate(q),
      "ungrouped count must keep its Generate — empty input yields one 0-row")
    assert(q.head().getLong(0) == 4L)
  }

  test("property: fold == unfold on random multisets (seeded scalacheck)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random multisets with deliberately colliding keys (range 0..6) so
    // every case exercises nontrivial multiplicities on both sides
    val msGen = Gen.listOfN(24, Gen.choose(0, 6))
    val cases = (0 until 12).flatMap { i =>
      for {
        l <- msGen(Gen.Parameters.default, Seed(1000L + i))
        r <- msGen(Gen.Parameters.default, Seed(2000L + i))
      } yield (l, r)
    }
    assert(cases.size == 12)
    cases.zipWithIndex.foreach { case ((l, r), i) =>
      val a = l.toDF("k")
      val b = r.toDF("k")
      def ex = a.exceptAll(b).groupBy($"k").agg(count(lit(1)).as("n"))
      def in = a.intersectAll(b).groupBy($"k").agg(count(lit(1)).as("n"))
      // reference multiplicities computed directly from the multisets
      val lc = l.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val rc = r.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expEx = lc.map { case (k, n) => k -> (n - rc.getOrElse(k, 0L)) }
        .filter(_._2 > 0)
      val expIn = lc.flatMap { case (k, n) =>
        val m = math.min(n, rc.getOrElse(k, 0L)); if (m > 0) Some(k -> m) else None
      }
      assert(!hasReplicate(ex), s"case $i: except-all fold did not fire")
      assert(!hasReplicate(in), s"case $i: intersect-all fold did not fire")
      val gotEx = ex.collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
      val gotIn = in.collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
      assert(gotEx == expEx, s"case $i except: $gotEx vs $expEx")
      assert(gotIn == expIn.toMap, s"case $i intersect: $gotIn vs $expIn")
    }
  }
}

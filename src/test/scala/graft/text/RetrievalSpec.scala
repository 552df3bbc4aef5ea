package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Retrieval.bm25]] ranking properties on a hand-built corpus (the
  * numeric parity with DuckDB is pinned by q136's hash-matched oracle;
  * this spec pins the semantics and the plan shape).
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark spark spark filter"),            // high tf, short
    (2L, "spark filter join hash merge window"), // one hit, longer
    (3L, "filter join hash merge row scan"),     // no hit
    (4L, "spark spark filter join hash merge row scan batch value") // tf 2, long
  ).toDF("id", "body")

  test("more hits in a shorter doc rank higher; no-hit docs are absent") {
    val top = Retrieval.bm25(corpus, "id", "body", Seq("spark"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(top.map(_._1).toSeq == Seq(1L, 4L, 2L),
      s"unexpected ranking: ${top.toSeq}")
    assert(!top.map(_._1).contains(3L), "zero-score doc leaked into results")
    assert(top.map(_._2).sorted.reverse.toSeq == top.map(_._2).toSeq)
  }

  test("multi-term scores are the sum of per-term scores") {
    def score(terms: Seq[String]): Map[Long, Double] =
      Retrieval.bm25(corpus, "id", "body", terms, k = 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val both = score(Seq("spark", "window"))
    val sOnly = score(Seq("spark"))
    val wOnly = score(Seq("window"))
    // doc 2 matches both terms; rounding each part to 6 decimals bounds
    // the reassembled sum within 2 ulps of the rounded joint score
    val joint = both(2L)
    val parts = sOnly(2L) + wOnly(2L)
    assert(math.abs(joint - parts) < 3e-6, s"$joint vs $parts")
  }

  test("plan: one top-k, no global sort, corpus constants broadcast") {
    val p = Retrieval.bm25(corpus, "id", "body", Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString()
    assert(p.contains("TakeOrderedAndProject"), s"global sort materialized:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"globals not broadcast:\n$p")
  }
}

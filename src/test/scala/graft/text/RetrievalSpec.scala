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

  test("batch scorer ≡ literal scorer for a single query (bit-exact)") {
    val terms = Seq("spark", "window", "merge", "filter")
    val q = terms.zipWithIndex.map { case (t, p) => (0L, t, p) }
      .toDF("query_id", "term", "pos")
    val literal = Retrieval.bm25(corpus, "id", "body", terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = Retrieval.bm25Batch(corpus, q, "id", "body", k = 10, arity = 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // same per-term doubles, same +-chain order → identical, not just close
    assert(batch == literal, s"$batch vs $literal")
  }

  test("batch: independent queries rank independently, k caps per query") {
    val q = Seq(
      (0L, "spark", 0), (0L, "filter", 1),
      (1L, "scan", 0), (1L, "row", 1)).toDF("query_id", "term", "pos")
    val got = Retrieval.bm25Batch(corpus, q, "id", "body", k = 2, arity = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.count(_._1 == 0L) == 2 && got.count(_._1 == 1L) == 2)
    // query 1 only matches docs 3 and 4 (scan/row live there)
    assert(got.filter(_._1 == 1L).map(_._2).toSet == Set(3L, 4L))
  }

  test("batch plan: the corpus parquet is scanned ONCE (tf exchange reused)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25b_").toString
    corpus.write.parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    val q = Seq((0L, "spark", 0), (1L, "join", 0)).toDF("query_id", "term", "pos")
    val df = Retrieval.bm25Batch(docs, q, "id", "body", k = 3, arity = 1)
    df.collect() // finalize THIS QueryExecution's adaptive plan
    val full = df.queryExecution.executedPlan.toString()
    assert(full.contains("isFinalPlan=true"), s"adaptive plan not finalized:\n$full")
    // AQE's toString appends the pre-execution "Initial Plan" — only the
    // Final Plan section reflects what actually ran (and reused)
    val p = full.split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1,
      s"corpus scanned $scans times — lens/dfs/match must reuse tf's exchange:\n$p")
  }
}

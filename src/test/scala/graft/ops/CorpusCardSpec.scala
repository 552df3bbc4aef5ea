package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[CorpusCard]]: every deterministic field of the datasheet is exact
  * on a hand-computable corpus; the KLL length quantiles sit inside
  * their rank bound; dominant tokens come back exact and ordered.
  */
class CorpusCardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 6 docs: one null text, one whitespace-only, a duplicated id, two
    * langs. Token math by hand: "a a b" ×2 (en) + "b c" (fr) +
    * "a" (fr) = 6+2+1 = 9 tokens. */
  private def corpus = Seq(
    (1L, "a a b", "en"),
    (2L, "a a b", "en"),
    (2L, "b c", "fr"),        // duplicated id
    (3L, "a", "fr"),
    (4L, null.asInstanceOf[String], "en"),
    (5L, "   ", "fr")
  ).toDF("doc_id", "text", "lang")

  test("deterministic fields are exact on a hand-computed corpus") {
    val card = CorpusCard.build(corpus, hhFrac = 0.2).head()
    assert(card.getAs[Long]("n_docs") == 6L)
    assert(card.getAs[Long]("n_distinct_ids") == 5L) // id 2 duplicated
    assert(card.getAs[Long]("n_empty") == 2L)        // null + whitespace
    assert(card.getAs[Long]("total_tokens") == 9L)
    val langs = card.getAs[Map[String, Long]]("lang_counts")
    assert(langs == Map("en" -> 3L, "fr" -> 3L))
    // heavy hitters at 20% of 9 tokens = ceil threshold 2: a(5), b(3)
    val tops = card.getSeq[org.apache.spark.sql.Row](card.fieldIndex("top_tokens"))
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt")))
    assert(tops == Seq(("a", 5L), ("b", 3L)))
  }

  test("token-length quantiles sit inside the KLL rank bound") {
    // 2000 docs with token counts 1..2000 — p50 must land near 1000
    val docs = spark.range(1, 2001)
      .select($"id".as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), $"id".cast("int")),
          _ => lit("w"))).as("text"),
        lit("en").as("lang"))
    val row = CorpusCard.build(docs, hhFrac = 0.9).head()
    val q = row.getSeq[Double](row.fieldIndex("token_len_q"))
    assert(math.abs(q.head - 1000.0) <= 100.0, s"p50=${q.head}")
    assert(q(1) >= 1800.0 && q(2) >= 1900.0, s"p95=${q(1)} p99=${q(2)}")
  }

  test("an empty corpus yields a zeroed card, not a crash") {
    val card = CorpusCard.build(corpus.filter(lit(false)), hhFrac = 0.5).head()
    assert(card.getAs[Long]("n_docs") == 0L)
    assert(card.getAs[Long]("n_distinct_ids") == 0L)
    assert(card.getAs[Long]("total_tokens") == 0L)
    assert(card.getSeq[Any](card.fieldIndex("top_tokens")).isEmpty)
  }
}

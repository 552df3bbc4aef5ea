package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[CorpusDiff]]: every field hand-checkable on a tiny pair of corpora,
  * and the degenerate identical-corpora case reads as zero drift. */
class CorpusDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpusOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("vocab delta, means, and KL match the hand computation") {
    val before = corpusOf("a a b", "b c")        // a:2 b:2 c:1, total 5
    val after = corpusOf("a b", "b c c d")       // a:1 b:2 c:2 d:1, total 6
    val row = CorpusDiff.diff(before, after).head()
    assert(row.getAs[Long]("n_docs_before") == 2L)
    assert(row.getAs[Long]("n_docs_after") == 2L)
    assert(row.getAs[Double]("mean_len_before") == 2.5)
    assert(row.getAs[Double]("mean_len_after") == 3.0)
    assert(row.getAs[Long]("vocab_added") == 1L)    // d
    assert(row.getAs[Long]("vocab_removed") == 0L)
    assert(row.getAs[Long]("vocab_common") == 3L)
    val expected = // Σ p·ln(p/q) over {a,b,c}
      (1.0 / 6) * math.log((1.0 / 6) / (2.0 / 5)) +
      (2.0 / 6) * math.log((2.0 / 6) / (2.0 / 5)) +
      (2.0 / 6) * math.log((2.0 / 6) / (1.0 / 5))
    assert(math.abs(row.getAs[Double]("kl_divergence") - expected) <= 2e-6,
      s"kl=${row.getAs[Double]("kl_divergence")} expected≈$expected")
  }

  test("identical corpora: zero drift everywhere") {
    val c = corpusOf("x y z", "x x")
    val row = CorpusDiff.diff(c, c).head()
    assert(row.getAs[Long]("vocab_added") == 0L)
    assert(row.getAs[Long]("vocab_removed") == 0L)
    assert(row.getAs[Double]("kl_divergence") == 0.0)
    assert(row.getAs[Double]("mean_len_before") ==
      row.getAs[Double]("mean_len_after"))
  }

  test("a removed token counts once, not per occurrence") {
    val before = corpusOf("gone gone gone keep")
    val after = corpusOf("keep keep")
    val row = CorpusDiff.diff(before, after).head()
    assert(row.getAs[Long]("vocab_removed") == 1L)
    assert(row.getAs[Long]("vocab_common") == 1L)
    // "keep" went from 1/4 of the old mass to all of the new → ln(4)
    assert(math.abs(row.getAs[Double]("kl_divergence") - math.log(4.0)) <= 2e-6)
  }
}

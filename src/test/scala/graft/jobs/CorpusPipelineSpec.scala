package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("full pipeline: each planted defect is dropped at its stage") {
    val good1 = "the quick brown fox jumps over the lazy dog and it is that good " * 3
    val good2 = "it is a truth universally acknowledged that a single engine in want of a query must shuffle " * 3
    val good3 = "call me ishmael for it is the story of a whale and the sea that is told " * 3
    val docs = Seq(
      (1L, good1 + "one"),                              // survives
      (2L, good2 + "two"),                              // survives
      (3L, "der hund ist nicht mit der katze und das haus"), // wrong language
      (4L, good1 + "one"),                              // exact dup of 1
      (5L, good1 + "one extra tail"),                   // near dup of 1
      (6L, good3 + "with alpha beta gamma delta epsilon inside it"), // contaminated
      // English (stopword hit) but punctuation junk → quality floor
      (7L, "the ,,,,,,,,,,,,,,,,,,,,,, !!!!!!!!!!!!!!!!"))
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")

    val (packed, r) = CorpusPipeline.run(docs, evalSet,
      CorpusPipeline.Config(minQuality = 0.5, spanChunkTokens = 64))

    assert(r.input == 7L)
    assert(r.afterLang == 6L)       // doc 3 out (de)
    assert(r.afterExact == 5L)      // doc 4 out
    assert(r.afterNear == 4L)       // doc 5 out
    assert(r.afterDecontam <= r.afterSpan && r.afterSpan <= r.afterNear)
    val ids = packed.select($"doc_id").as[Long].collect().toSet
    assert(!ids.contains(6L), "contaminated doc must not survive")
    assert(!ids.contains(7L), "low-quality doc must not survive")
    assert(ids.contains(1L) || ids.contains(4L)) // one keeper of the exact pair
    // output carries the full training metadata
    assert(packed.columns.toSet == Set("doc_id", "text", "lang_pred",
      "quality", "split", "pack_shard", "n_tokens", "pack_offset", "pack_id"))
    // packing is per split: offsets restart at 0 in every split
    val firstOffsets = packed.groupBy($"split")
      .agg(org.apache.spark.sql.functions.min($"pack_offset"))
      .as[(String, Long)].collect().toMap
    firstOffsets.values.foreach(o => assert(o == 0L))
  }
}

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

  test("publish gate: clean output passes, planted duplicate fails loudly") {
    import org.apache.spark.sql.functions.{col, lit}
    val packed = Seq(
      (1L, "some text", "en", 0.8, "train", "train/0", 3L, 0L, 0L),
      (2L, "more text", "en", 0.9, "train", "train/0", 3L, 3L, 0L))
      .toDF("doc_id", "text", "lang_pred", "quality", "split", "pack_shard",
        "n_tokens", "pack_offset", "pack_id")
    // clean corpus sails through unchanged
    assert(CorpusPipeline.publishGate(packed, minQuality = 0.5)
      .count() == 2L)
    // a duplicated doc_id (the invariant dedup is supposed to guarantee)
    // must throw, naming the failing check
    val dup = packed.unionByName(packed.filter(col("doc_id") === 1L))
    val err = intercept[IllegalStateException] {
      CorpusPipeline.publishGate(dup, minQuality = 0.5)
    }
    assert(err.getMessage.contains("unique:doc_id"), err.getMessage)
    // quality below the floor trips the bounds check
    val low = packed.withColumn("quality", lit(0.1))
    val err2 = intercept[IllegalStateException] {
      CorpusPipeline.publishGate(low, minQuality = 0.5)
    }
    assert(err2.getMessage.contains("bounds:quality"), err2.getMessage)
  }

  test("logged publish: snapshot commit, datasheet, re-publish is a new version") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.sources.CommitLog
    val lake = java.nio.file.Files.createTempDirectory("corpus_pub_")
      .toString + "/corpus"
    def packedRows(tag: String) = Seq(
      (1L, s"alpha text $tag", "en", 0.8, "train", "train/0", 3L, 0L, 0L),
      (2L, s"beta text $tag", "en", 0.9, "train", "train/0", 3L, 3L, 0L),
      (3L, s"gamma text $tag", "en", 0.7, "val", "val/0", 3L, 0L, 0L))
      .toDF("doc_id", "text", "lang_pred", "quality", "split", "pack_shard",
        "n_tokens", "pack_offset", "pack_id")
    val (snap1, card1) = CorpusPipeline.publishLogged(
      packedRows("v1"), minQuality = 0.5, lake)
    assert(snap1.version == 1L)
    assert(card1.head().getAs[Long]("n_docs") == 3L)
    assert(CommitLog.read(spark, lake).count() == 3L)
    // a failing audit publishes NOTHING — the lake stays at v1
    intercept[IllegalStateException] {
      CorpusPipeline.publishLogged(
        packedRows("bad").withColumn("quality", lit(0.1)),
        minQuality = 0.5, lake)
    }
    assert(CommitLog.latest(spark, lake).get.version == snap1.version)
    // a refreshed corpus re-publishes as the NEXT version; only the
    // train partition changed, and readers of v1 still see v1 text
    val (snap2, card2) = CorpusPipeline.publishLogged(
      packedRows("v2").filter(col("split") === "train"),
      minQuality = 0.5, lake)
    assert(snap2.version == snap1.version + 1)
    assert(card2.head().getAs[Long]("n_docs") == 3L)
    assert(CommitLog.read(spark, lake)
      .filter(col("text").contains("v2")).count() == 2L)
    assert(CommitLog.readAt(spark, lake, snap1.version)
      .filter(col("text").contains("v1")).count() == 3L)
    val untouched = snap1.files.filter(_.startsWith("split=val/")).toSet
    assert(untouched.subsetOf(snap2.files.toSet),
      "re-publish rewrote the untouched split")
  }
}

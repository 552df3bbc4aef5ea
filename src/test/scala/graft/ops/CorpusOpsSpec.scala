package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("deterministicSplit: stable under corpus growth, roughly 80/10/10") {
    val small = (0L until 500L).toDF("id")
    val grown = (0L until 1000L).toDF("id")
    val a = CorpusOps.deterministicSplit(small, "id")
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val b = CorpusOps.deterministicSplit(grown, "id")
      .select($"id", $"split").as[(Long, String)].collect().toMap
    // adding documents never reassigns existing ones
    assert(a.forall { case (id, s) => b(id) == s })
    val counts = b.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("test") > 50)
  }

  test("packSequences: per-partition offsets, budget boundaries, no straddle of partitions") {
    val docs = Seq(
      (1L, "a", 60L), (2L, "a", 50L), (3L, "a", 10L), (4L, "a", 100L),
      (10L, "b", 90L), (11L, "b", 30L))
      .toDF("id", "shard", "toks")
    val packed = CorpusOps.packSequences(docs, "id", $"toks", "shard", budget = 100)
      .select($"id", $"pack_offset", $"pack_id").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(packed(1L) == ((0L, 0L)))    // first in shard a
    assert(packed(2L) == ((60L, 0L)))   // still inside pack 0
    assert(packed(3L) == ((110L, 1L)))  // crossed the 100-token budget
    assert(packed(4L) == ((120L, 1L)))
    assert(packed(10L) == ((0L, 0L)))   // shard b restarts at offset 0
    assert(packed(11L) == ((90L, 0L)))
  }

  test("contaminatedDocs: finds the planted overlap, counts distinct grams") {
    val eval = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (100L, "prefix words then alpha beta gamma delta epsilon appears here"),
      (101L, "totally clean document with no overlap at all whatsoever"),
      (102L, "short text")) // < 5 tokens: excluded
      .toDF("doc_id", "text")
    val hits = CorpusOps.contaminatedDocs(train, eval, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    // doc 100 shares exactly one 5-gram: "alpha beta gamma delta epsilon"
    assert(hits == Map(100L -> 1L))
  }
}

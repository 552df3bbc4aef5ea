package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** The registered streaming demo queries (q132/q133) — these run the real
  * Structured Streaming flows, so the assertions here are about the END
  * STATE the driver will smoke-check each round, not the operator
  * internals (StreamingIngestSpec covers those).
  */
class StreamingQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q132: streamed upsert converges to the newest version of every key") {
    val out = SparkEntrySubset.run("q132_stream_upsert", sf)
    assert(out.count() > 0)
    // only seq=2 rows may survive — v1 rows crossed micro-batches in
    // arbitrary order and every one must have been superseded
    val seqs = out.select($"min_seq", $"max_seq").distinct()
      .as[(Long, Long)].collect().toSet
    assert(seqs == Set((2L, 2L)), s"stale versions survived the upsert: $seqs")
    // per-partition key counts must equal the batch ground truth
    val expected = Tables.documents(spark, sf).filter($"doc_id" < 200)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val got = out.select($"part", $"n_keys").as[(String, Long)].collect().toMap
    assert(got == expected, s"per-partition keys: got $got expected $expected")
  }

  test("q133: every planted near-dup copy is flagged against its original") {
    val out = SparkEntrySubset.run("q133_stream_neardup", sf)
    val pairs = out.select($"id", $"dup_of").as[(Long, Long)].collect().toSet
    val planted = Tables.documents(spark, sf)
      .filter($"doc_id" < 300 && $"doc_id" % 10 === 0)
      .select($"doc_id").as[Long].collect()
      .map(d => (d + 1000000L, d)).toSet
    assert(planted.nonEmpty, "fixture lost its doc_id % 10 == 0 rows")
    assert(planted.subsetOf(pairs),
      s"missed planted pairs: ${planted -- pairs}")
  }
}

/** Runs a registered query through the same entry point the driver uses. */
private object SparkEntrySubset {
  def run(name: String, sfDir: String): org.apache.spark.sql.DataFrame =
    graft.SparkEntry.queries(name)(TestSpark.spark, sfDir)
}

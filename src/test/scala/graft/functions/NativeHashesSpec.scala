package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.dedup.Dedup
import graft.tables.Tables

class NativeHashesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .limit(50).select($"doc_id", $"text")
    .union(Seq((9001L, ""), (9002L, "  one  "), (9003L, "a b"),
      (9004L, "Tabs\tand  CASE Mixed")).toDF("doc_id", "text"))

  test("native minhash signature is bit-identical to the pure-expression form") {
    val both = docs.select(
      $"doc_id",
      Dedup.minhashSignature($"text", n = 3, k = 64).as("pure"),
      NativeHashes.minhashSig($"text", n = 3, k = 64).as("native"))
    val bad = both.filter(not($"pure" <=> $"native")).count()
    assert(bad == 0, s"$bad rows diverge between native and pure minhash")
  }

  test("native simhash is bit-identical to the pure-expression form") {
    val both = docs.select(
      $"doc_id",
      Dedup.simhash64($"text", n = 2).as("pure"),
      NativeHashes.simhash64($"text", n = 2).as("native"))
    val bad = both.filter(not($"pure" <=> $"native")).count()
    assert(bad == 0, s"$bad rows diverge between native and pure simhash")
  }

  test("SQL registration works (graft_minhash_sig / graft_simhash64)") {
    NativeHashes.register(spark)
    docs.createOrReplaceTempView("native_docs")
    val row = spark.sql(
      """SELECT size(graft_minhash_sig(text)) AS k, graft_simhash64(text) AS sig
        |FROM native_docs WHERE doc_id = 0""".stripMargin)
      .as[(Int, Long)].head()
    assert(row._1 == 64)
    val cos = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d))")
      .as[Double].head()
    assert(cos == 1.0)
  }

  test("native shingle hashes are bit-identical to the pure-expression form") {
    val both = docs.select(
      $"doc_id",
      transform(Dedup.shingles($"text", 3), s => xxhash64(s)).as("pure"),
      NativeHashes.shingleHashes($"text", 3).as("native"))
    val bad = both.filter(not($"pure" <=> $"native")).count()
    assert(bad == 0, s"$bad rows diverge between native and pure shingle hashes")
  }

  test("native winnow fingerprint is bit-identical to the pure-expression form") {
    val both = docs.select(
      $"doc_id",
      graft.text.TextAnalysis.winnowFingerprint($"text", 16, 4).as("pure"),
      NativeHashes.winnowFingerprint($"text", 16, 4).as("native"))
    val bad = both.filter(not($"pure" <=> $"native")).count()
    assert(bad == 0, s"$bad rows diverge between native and pure winnow fingerprint")
  }
}

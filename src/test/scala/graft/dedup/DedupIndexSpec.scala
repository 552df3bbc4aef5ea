package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.{CommitLog, LakeTxn}

/** [[DedupIndex]]: index-served exact Jaccard must equal brute force at
  * every threshold (lossless one-sided prefix blocking), maintenance
  * must converge to the from-scratch index, and serving must follow the
  * txn-pinned family cut — never a half-committed one. */
class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Synthetic corpus: doc i = words (i..i+9 mod 40) → neighbours share
    * tokens in proportion to distance; plus a stopword-ish token "the"
    * in every doc so a common term exists. */
  private def corpus(n: Int): DataFrame =
    spark.range(0, n).select($"id".as("doc_id"),
      concat_ws(" ", lit("the") +: (0 until 10).map(j =>
        concat(lit("w"), (($"id" + j) % 40).cast("string"))): _*)
        .as("text"))

  private def bruteForce(corpusDf: DataFrame, newDf: DataFrame,
      t: Double): Set[(Long, Long, Double)] = {
    def toks(df: DataFrame, idAs: String) = df.select(
      col("doc_id").as(idAs),
      array_distinct(graft.text.TextAnalysis.tokens(lower(col("text"))))
        .as(s"toks_$idAs"))
    toks(newDf, "new_id").crossJoin(toks(corpusDf, "old_id"))
      .select($"new_id", $"old_id",
        (size(array_intersect($"toks_new_id", $"toks_old_id")).cast("double") /
          size(array_union($"toks_new_id", $"toks_old_id"))).as("j"))
      .filter($"j" >= t)
      .as[(Long, Long, Double)].collect().toSet
  }

  private def served(dir: String, newDf: DataFrame,
      t: Double): Set[(Long, Long, Double)] =
    DedupIndex.search(spark, dir, newDf, "doc_id", "text", t)
      .as[(Long, Long, Double)].collect().toSet

  test("index-served search ≡ brute force at several thresholds") {
    val dir = Files.createTempDirectory("graft_dedupidx_").toString + "/idx"
    val old = corpus(30)
    DedupIndex.build(spark, old, "doc_id", "text", dir, numFiles = 4)
    // new docs: shifted copies (overlap varies with shift) + one exact dup
    val fresh = corpus(40).filter($"doc_id" >= 25 && $"doc_id" < 35)
      .select(($"doc_id" + 1000).as("doc_id"), $"text")
      .unionByName(old.filter($"doc_id" === 3)
        .select(($"doc_id" + 2000).as("doc_id"), $"text"))
    for (t <- Seq(0.3, 0.5, 0.8)) {
      assert(served(dir, fresh, t) == bruteForce(old, fresh, t),
        s"threshold $t")
    }
    // the exact dup must surface at j = 1.0
    assert(served(dir, fresh, 0.99).exists { case (n, o, j) =>
      n == 2003L && o == 3L && j == 1.0 })
  }

  test("probe docs with no shared vocabulary (or no tokens) return empty, not an error") {
    val dir = Files.createTempDirectory("graft_dedupidx2_").toString + "/idx"
    DedupIndex.build(spark, corpus(10), "doc_id", "text", dir, numFiles = 2)
    val alien = Seq((500L, "zz yy xx"), (501L, " ")).toDF("doc_id", "text")
    assert(served(dir, alien, 0.3).isEmpty)
  }

  test("update converges to the from-scratch index (postings, terms, and served results)") {
    val base = Files.createTempDirectory("graft_dedupidx3_").toString
    val incDir = s"$base/inc"
    val refDir = s"$base/ref"
    val old = corpus(30)
    DedupIndex.build(spark, old, "doc_id", "text", incDir, numFiles = 4)
    // churn: edit doc 5, remove doc 7 (empty text), add doc 100
    val churn = Seq(
      (5L, "the w90 w91 w92 w93"),
      (7L, " "),
      (100L, "the w91 w92 w93 w94")).toDF("doc_id", "text")
    DedupIndex.update(spark, incDir, churn)
    val post = old.filter($"doc_id" =!= 5L && $"doc_id" =!= 7L)
      .unionByName(Seq((5L, "the w90 w91 w92 w93"),
        (100L, "the w91 w92 w93 w94")).toDF("doc_id", "text"))
    DedupIndex.build(spark, post, "doc_id", "text", refDir, numFiles = 4)
    def termRows(d: String): Set[(String, Long)] =
      CommitLog.read(spark, s"$d/terms").as[(String, Long)].collect().toSet
    def postRows(d: String): Set[(String, Long, Int)] =
      CommitLog.read(spark, s"$d/postings")
        .as[(String, Long, Int)].collect().toSet
    assert(termRows(incDir) == termRows(refDir))
    assert(postRows(incDir) == postRows(refDir))
    val probe = Seq((9000L, "the w90 w91 w92 w93 w94")).toDF("doc_id", "text")
    assert(served(incDir, probe, 0.5) == served(refDir, probe, 0.5))
    assert(served(incDir, probe, 0.5) == bruteForce(post, probe, 0.5))
    // replaying the same churn is a no-op on the family state
    DedupIndex.update(spark, incDir, churn)
    assert(termRows(incDir) == termRows(refDir))
    assert(postRows(incDir) == postRows(refDir))
  }

  test("replaying an update repairs a partially-applied one (terms recompute absolutely)") {
    val base = Files.createTempDirectory("graft_dedupidx5_").toString
    val incDir = s"$base/inc"
    val refDir = s"$base/ref"
    val old = corpus(20)
    DedupIndex.build(spark, old, "doc_id", "text", incDir, numFiles = 2)
    val newText = "the w90 w91 w92"
    // simulate the crash window of an update of doc 5: its POSTINGS
    // commit landed, the terms recompute and the txn cut did not —
    // latest postings are now ahead of both the terms table and the pin
    val partial = Seq("the", "w90", "w91", "w92")
      .map(t => (t, 5L, 4)).toDF("term", "doc_id", "sz")
    CommitLog.replaceWhere(spark, s"$incDir/postings",
      col("doc_id") === 5L, partial, probe = Some(("doc_id", Seq(5L))))
    // the at-least-once replay of the same batch must repair everything
    DedupIndex.update(spark, incDir,
      Seq((5L, newText)).toDF("doc_id", "text"))
    val post = old.filter($"doc_id" =!= 5L)
      .unionByName(Seq((5L, newText)).toDF("doc_id", "text"))
    DedupIndex.build(spark, post, "doc_id", "text", refDir, numFiles = 2)
    def termRows(d: String): Set[(String, Long)] =
      CommitLog.read(spark, s"$d/terms").as[(String, Long)].collect().toSet
    def postRows(d: String): Set[(String, Long, Int)] =
      CommitLog.read(spark, s"$d/postings")
        .as[(String, Long, Int)].collect().toSet
    assert(postRows(incDir) == postRows(refDir))
    assert(termRows(incDir) == termRows(refDir),
      "terms must converge even though the replayed postings delta is zero")
  }

  test("family vacuum keeps the pinned cut servable after churn") {
    val dir = Files.createTempDirectory("graft_dedupidx6_").toString + "/idx"
    val old = corpus(20)
    DedupIndex.build(spark, old, "doc_id", "text", dir, numFiles = 2)
    DedupIndex.update(spark, dir,
      Seq((3L, "the w95 w96 w97")).toDF("doc_id", "text"))
    DedupIndex.update(spark, dir,
      Seq((3L, "the w95 w96 w98")).toDF("doc_id", "text"))
    DedupIndex.vacuum(spark, dir)
    val probe = Seq((9000L, "the w95 w96 w98")).toDF("doc_id", "text")
    val hits = served(dir, probe, 0.7)
    assert(hits.exists(_._2 == 3L), s"pinned cut must stay servable: $hits")
  }

  test("serving follows the txn pin: a postings commit without a txn cut stays invisible") {
    val dir = Files.createTempDirectory("graft_dedupidx4_").toString + "/idx"
    val old = corpus(20)
    DedupIndex.build(spark, old, "doc_id", "text", dir, numFiles = 2)
    val probe = Seq((9000L, old.filter($"doc_id" === 4)
      .select($"text").as[String].head())).toDF("doc_id", "text")
    val before = served(dir, probe, 0.99)
    assert(before.exists(_._2 == 4L))
    // a writer crashes mid-update: postings commit lands, txn cut does not
    CommitLog.replaceWhere(spark, s"$dir/postings",
      col("doc_id") === 4L, spark.emptyDataFrame
        .select(lit("x").as("term"), lit(0L).as("doc_id"), lit(1).as("sz"))
        .limit(0),
      probe = Some(("doc_id", Seq(4L))))
    // latest postings no longer hold doc 4 — but serving is pinned
    assert(CommitLog.read(spark, s"$dir/postings")
      .filter($"doc_id" === 4L).count() == 0L)
    assert(served(dir, probe, 0.99) == before,
      "search must serve the pinned family cut, not the torn latest")
  }
}

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

  test("vocabulary: counts, doc frequency, min-count pruning, total order") {
    val docs = Seq(
      (1L, "alpha alpha beta"), (2L, "alpha beta gamma"), (3L, "alpha delta"))
      .toDF("doc_id", "text")
    val v = CorpusOps.vocabulary(docs, "doc_id", "text", minCount = 2L)
      .as[(String, Long, Long)].collect().toList
    assert(v == List(("alpha", 4L, 3L), ("beta", 2L, 2L)))
  }

  test("tfidfTopTerms: rare terms outrank common ones; ranks deterministic") {
    val docs = Seq(
      (1L, "common rare1 common common"),
      (2L, "common other words here"),
      (3L, "common more words again"))
      .toDF("doc_id", "text")
    val top = CorpusOps.tfidfTopTerms(docs, "doc_id", "text", k = 1)
      .select($"doc_id", $"term").as[(Long, String)].collect().toMap
    // "common" appears in every doc → idf_scaled = 1e6·3 // 3 = 1e6;
    // "rare1" df=1 → 3e6; tf 3 vs 1 → common 3e6 ties rare1 3e6 → term
    // asc breaks the tie deterministically
    assert(top(1L) == "common")
    assert(top(2L) != "common" || top(3L) != "common")
  }

  test("chunkDocuments: overlapping windows, clamped tail, empty-doc chunk") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")), (2L, ""))
      .toDF("doc_id", "text")
    val chunks = CorpusOps.chunkDocuments(docs, "doc_id", "text",
      chunkTokens = 4, overlap = 2)
      .select($"doc_id", $"chunk_idx", $"chunk")
      .as[(Long, Int, String)].collect().toList.sorted
    assert(chunks == List(
      (1L, 0, "w1 w2 w3 w4"), (1L, 1, "w3 w4 w5 w6"), (1L, 2, "w5 w6 w7 w8"),
      (1L, 3, "w7 w8 w9 w10"), (1L, 4, "w9 w10"), (2L, 0, "")))
  }

  test("maskPii: emails and phone-shaped runs masked, text preserved") {
    val got = Seq(
      "contact bob@example.com or +1 (555) 123-4567 today",
      "no pii here at all").toDF("t")
      .select(CorpusOps.maskPii($"t")).as[String].collect().toList
    assert(got == List("contact <EMAIL> or <PHONE> today", "no pii here at all"))
  }

  test("repetitionSignals: dup/top fractions over tokens and 2-grams") {
    val docs = Seq(
      (1L, "a a a b"),            // 4 tokens, 2 distinct, top=3; 3 2-grams ("a a"×2, "a b"), 2 distinct
      (2L, "x y z"),              // no repetition
      (3L, "w"))                  // single token: zero 2-grams
      .toDF("doc_id", "text")
    val got = CorpusOps.repetitionSignals(docs, "doc_id", "text")
      .select($"doc_id", $"total_tokens", $"distinct_tokens", $"top_count",
        $"total_2grams", $"distinct_2grams", $"dup_token_frac", $"dup_2gram_frac")
      .as[(Long, Long, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 2L, 3L, 3L, 2L, 0.5, 1.0 - 2.0 / 3.0)))
    assert(got(2L) == ((2L, 3L, 3L, 1L, 2L, 2L, 0.0, 0.0)))
    assert(got(3L) == ((3L, 1L, 1L, 1L, 0L, 0L, 0.0, 0.0)))
  }

  test("boilerplateGrams: cross-doc repeated n-grams with doc/occurrence counts") {
    val banner = "this file is part of project x"
    val docs = Seq(
      (1L, s"$banner and does one thing"),
      (2L, s"$banner and does another"),
      (3L, s"unrelated content here entirely different words"),
      (4L, s"$banner $banner twice in one doc"))
      .toDF("doc_id", "text")
    val got = CorpusOps.boilerplateGrams(docs, "doc_id", "text",
      n = 7, minDocs = 3L, maxSize = 10)
      .as[(String, Long, Long)].collect().toList
    // the 7-gram banner appears in docs 1, 2, 4 (twice in 4 → 4 occurrences)
    assert(got.contains((banner, 3L, 4L)))
    assert(got.forall(_._2 >= 3L))
  }

  test("stratifiedSample: exact per-stratum fraction, deterministic membership") {
    val docs = (0L until 200L).map(i => (i, s"s${i % 2}")).toDF("id", "src")
    val a = CorpusOps.stratifiedSample(docs, "id", "src", 0.1)
      .select($"id").as[Long].collect().toSet
    val b = CorpusOps.stratifiedSample(docs, "id", "src", 0.1)
      .select($"id").as[Long].collect().toSet
    assert(a == b, "same sample on re-run")
    val perSrc = CorpusOps.stratifiedSample(docs, "id", "src", 0.1)
      .groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(perSrc == Map("s0" -> 10L, "s1" -> 10L)) // ceil(0.1·100) exactly
  }

  test("dedupSpans: first occurrence of a shared chunk wins, docs reassemble") {
    val docs = Seq(
      (1L, "a b c d e f"),       // chunks (size 4): "a b c d" | "e f"
      (2L, "a b c d x y"),       // first chunk duplicates doc 1's → dropped
      (3L, "p q r s"))           // untouched
      .toDF("doc_id", "text")
    val got = CorpusOps.dedupSpans(docs, "doc_id", "text", chunkTokens = 4)
      .select($"doc_id", $"n_chunks", $"n_kept", $"clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 2L, "a b c d e f")))
    assert(got(2L) == ((2L, 2L, 1L, "x y")))
    assert(got(3L) == ((3L, 1L, 1L, "p q r s")))
  }

  test("weightedSample: deterministic, weight-monotone, heavy docs dominate") {
    val df = (1L to 200L).map(i => (i, "s", if (i % 2 == 0) 1000.0 else 1.0))
      .toDF("id", "src", "w")
    val got = CorpusOps.weightedSample(df, "id", "src", "w", 10)
      .select($"id").as[Long].collect().toSet
    val again = CorpusOps.weightedSample(df, "id", "src", "w", 10)
      .select($"id").as[Long].collect().toSet
    assert(got == again, "same sample on re-run")
    // 1000× weight → heavy (even) ids should take essentially every slot
    assert(got.count(_ % 2 == 0) >= 8, s"heavy docs under-sampled: $got")
    // fixed uniform: raising one doc's weight never worsens its rank
    val base = CorpusOps.weightedSample(df, "id", "src", "w", 200)
      .filter($"id" === 7L).select($"rank").as[Int].head()
    val boosted = CorpusOps.weightedSample(
      df.withColumn("w", when($"id" === 7L, 500.0).otherwise($"w")),
      "id", "src", "w", 200)
      .filter($"id" === 7L).select($"rank").as[Int].head()
    assert(boosted <= base)
    // negative ids (hash surrogates): pmod fold keeps u in (0,1] — no
    // null sort keys, no ANSI error, all k slots filled
    val neg = (1L to 50L).map(i => (-i, "s", 1.0)).toDF("id", "src", "w")
    val negGot = CorpusOps.weightedSample(neg, "id", "src", "w", 5)
      .select($"id", $"sample_key").as[(Long, Double)].collect()
    assert(negGot.length == 5 && negGot.forall(r => !r._2.isNaN))
  }

  test("bigramLmScore: MLE ratios from corpus counts; short docs absent") {
    import org.apache.spark.sql.functions.{lower, split, trim}
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"),
      (4L, "solo"), (5L, "")) // < 2 tokens → no bigrams → absent
      .toDF("doc_id", "text")
    val got = CorpusOps.bigramLmScore(docs, "doc_id", "text",
        t => split(trim(lower(t)), "\\s+"))
      .as[(Long, Long, Double)].collect().toSeq
    // c(a,b)=2, c(a,c)=1, c(a,·)=3 → docs 1,2 score ln(2/3); doc 3 ln(1/3)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got.map(_._2).forall(_ == 1L))
    assert(math.abs(got(0)._3 - r6(math.log(2.0 / 3))) < 1e-9)
    assert(math.abs(got(2)._3 - r6(math.log(1.0 / 3))) < 1e-9)
  }

  test("collocationsPmi: hand-computed PMI, min-count prune, total order") {
    import org.apache.spark.sql.functions.{lower, split, trim}
    // pairs: (x,y)×2, (x,z)×1, (w,z)×1 → N=4, c1(x)=3, c1(w)=1,
    // cc2(y)=2, cc2(z)=2 → PMI(x,y)=ln(4/3), PMI(x,z)=ln(2/3), PMI(w,z)=ln(2)
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"), (4L, "w z"))
      .toDF("doc_id", "text")
    val got = CorpusOps.collocationsPmi(docs, "doc_id", "text",
        t => split(trim(lower(t)), "\\s+"), minCount = 1L, k = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got == Seq(
      ("w", "z", 1L, r6(math.log(2.0))),
      ("x", "y", 2L, r6(math.log(4.0 / 3))),
      ("x", "z", 1L, r6(math.log(2.0 / 3)))))
    // min-count prune drops everything below the threshold
    val pruned = CorpusOps.collocationsPmi(docs, "doc_id", "text",
      t => split(trim(lower(t)), "\\s+"), minCount = 2L, k = 10)
    assert(pruned.count() == 1)
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

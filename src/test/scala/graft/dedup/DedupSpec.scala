package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (3L, "completely unrelated text about spark query engines and catalyst optimizers"),
    (4L, "THE QUICK  brown fox jumps over the lazy dog near the river bank today"),
    (5L, "another fully distinct document discussing minhash banding mathematics"),
    (6L, "the quick brown fox jumps over the lazy dog near the river bank today extra"))
    .toDF("doc_id", "text")

  test("exactDups groups case/whitespace variants; dropExactDups keeps min id") {
    val groups = Dedup.exactDups(corpus, "doc_id", "text")
    assert(groups.count() == 5) // 1 and 4 collapse
    assert(groups.filter($"n_copies" === 2).select($"keeper_id").as[Long].head() == 1L)
    val kept = Dedup.dropExactDups(corpus, "doc_id", "text")
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L, 5L, 6L))
  }

  test("shingles: n-grams, distinct, short-text fallback") {
    val got = Seq("a b c d").toDF("t")
      .select(Dedup.shingles($"t", 3)).as[Seq[String]].head()
    assert(got.toSet == Set("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(Dedup.shingles($"t", 3)).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("jaccard: identical → 1, disjoint → 0") {
    val df = Seq(("x y z", "x y z"), ("a b c", "p q r")).toDF("t1", "t2")
    val got = df.select(
      Dedup.jaccard(Dedup.shingles($"t1", 2), Dedup.shingles($"t2", 2)))
      .as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0))
  }

  test("minhash LSH finds all high-jaccard pairs the brute force finds") {
    val brute = Dedup.nearDupPairsBruteForce(corpus, "doc_id", "text", n = 3, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty) // (1,2),(1,4),(1,6) at least
    assert(brute.contains((1L, 4L)))
    val lsh = Dedup.nearDupPairsMinhash(corpus, "doc_id", "text",
      n = 3, k = 64, bands = 16, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // verification step makes LSH ⊆ brute-force; banding at j≥0.7,r=4,b=16
    // gives P(miss) < (1-0.7^4)^16 ≈ 0.8% per pair — deterministic here
    assert(lsh == brute)
  }

  test("unrelated docs produce no near-dup pairs") {
    val distinct = corpus.filter($"doc_id".isin(3L, 5L))
    assert(Dedup.nearDupPairsMinhash(distinct, "doc_id", "text").count() == 0)
    assert(Dedup.nearDupPairsBruteForce(distinct, "doc_id", "text").count() == 0)
  }

  test("simhash: identical token sets → hamming 0; near-dups small hamming") {
    val sigs = corpus.select($"doc_id", Dedup.simhash64($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    // 1 and 4 differ only by case/spacing → identical lowercased token set
    assert(sigs(1L) == sigs(4L))
    val d12 = java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
    val d13 = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    assert(d12 < d13, s"near-dup hamming $d12 should beat unrelated $d13")
    val pairs = Dedup.nearDupPairsSimhash(corpus, "doc_id", "text", maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.contains((3L, 5L)))
  }

  test("resolveClusters / dropNearDups work with string (non-numeric) ids") {
    // same corpus, ids as strings — CC runs on xxhash64 surrogates and
    // cluster_id keeps the string type (min id by string ordering)
    val strCorpus = corpus.withColumn("doc_id", concat(lit("doc-"), $"doc_id"))
    val resolved = Dedup.resolveClusters(
      strCorpus, "doc_id",
      Dedup.nearDupPairsMinhash(strCorpus, "doc_id", "text", threshold = 0.7))
    assert(resolved.schema("cluster_id").dataType ==
      org.apache.spark.sql.types.StringType)
    val byCluster = resolved.groupBy($"cluster_id")
      .agg(sum(when($"is_keeper", 1).otherwise(0)).as("keepers"))
      .as[(String, Long)].collect().toMap
    assert(byCluster.values.forall(_ == 1L), s"one keeper per cluster: $byCluster")
    // cluster of {doc-1, doc-2, doc-4, doc-6} keeps the min string id
    assert(byCluster.keySet == Set("doc-1", "doc-3", "doc-5"))
    val kept = Dedup.dropNearDups(strCorpus, "doc_id", "text", threshold = 0.7)
      .select("doc_id").as[String].collect().toSet
    assert(kept == Set("doc-1", "doc-3", "doc-5"))
  }

  test("tokenJaccardPairs: exact set semantics, case/duplicate insensitive") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "A b c d"),        // same set after lowercasing → jaccard 1
      (3L, "a a a b"),        // duplicates collapse → {a,b}; ∩{a,b,c,d}=2, ∪=4
      (4L, "x y z w"))        // disjoint from doc 1
      .toDF("doc_id", "text")
    val got = Dedup.tokenJaccardPairs(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) == 1.0)
    assert(got((1L, 3L)) == 0.5)
    assert(got((1L, 4L)) == 0.0)
    assert(got.size == 6) // all id_a < id_b pairs present
  }

  test("editDistancePairs: classic distances, threshold filters") {
    val names = Seq(
      (1L, "kitten"), (2L, "sitting"),   // distance 3
      (3L, "kitten"),                    // distance 0 to 1
      (4L, "flawless"))                  // far from everything
      .toDF("id", "name")
    val got = Dedup.editDistancePairs(names, "id", "name", maxDist = 3)
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((1L, 2L) -> 3, (1L, 3L) -> 0, (2L, 3L) -> 3))
  }

  test("jaccardPairsPrefix: lossless — identical pairs to brute force") {
    // clusters of near-dups + singletons, with heavy shared stopwords so
    // the rarest-first prefix ordering actually earns its keep
    val docs = (0L until 40L).map { i =>
      val stop = "the of and a to in is it"
      val body = (0 until 6).map(j => s"w${(i / 4) * 6 + j}").mkString(" ")
      val noise = if (i % 4 == 3) s" x$i y$i" else ""
      (i, s"$stop $body$noise")
    }.toDF("doc_id", "text")
    // t·|s| lands just above an integer in doubles (0.07·100 =
    // 7.000000000000001): the DECIMAL ceil keeps the prefix length
    // exact; equality at this threshold guards the arithmetic
    val big = (0L until 6L).map { i =>
      (100L + i, ((0 until 80).map(j => s"c${i}t$j") ++
        (0 until 20).map(j => s"shared$j")).mkString(" "))
    }.toDF("doc_id", "text")
    val bruteBig = Dedup.tokenJaccardPairs(big, "doc_id", "text")
      .filter($"jaccard" >= 0.07)
      .select($"id_a", $"id_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val prefBig = Dedup.jaccardPairsPrefix(big, "doc_id", "text", 0.07)
      .as[(Long, Long, Double)].collect().toSet
    assert(prefBig == bruteBig && bruteBig.nonEmpty)
    // non-terminating decimal threshold (17 sig digits): must not crash
    // the BigDecimal scaling, and must stay lossless
    val bruteT = Dedup.tokenJaccardPairs(big, "doc_id", "text")
      .filter($"jaccard" >= 2.0 / 3).select($"id_a", $"id_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val prefT = Dedup.jaccardPairsPrefix(big, "doc_id", "text", 2.0 / 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(prefT == bruteT)
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val brute = Dedup.tokenJaccardPairs(docs, "doc_id", "text")
        .filter($"jaccard" >= t)
        .select($"id_a", $"id_b", $"jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", t)
        .as[(Long, Long, Double)].collect().toSet
      assert(pref == brute, s"mismatch at t=$t")
      assert(brute.nonEmpty, s"degenerate fixture at t=$t")
    }
  }
}

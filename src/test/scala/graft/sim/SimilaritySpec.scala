package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine: identical → 1, orthogonal → 0, zero-vector safe") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),
      (Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0))).toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b")).as[Double].collect().toSeq
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0 && got(2) == 0.0)
  }

  test("bruteForceTopK returns the true nearest neighbor first") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.95f, 0.05f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 0L), vecs, "vec_id", "embedding", k = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSeq
    assert(top == Seq((1L, 1), (2L, 2)))
  }

  test("ANN candidates carry exact cosine and valid ranks; recall is non-trivial") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(queries, emb, "vec_id", "embedding", 10,
      planes = 2, dim = 64)
    val annRows = ann.collect()
    assert(annRows.forall(r => r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 10))
    val annPairs = ann.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (annPairs intersect exact).size.toDouble / exact.size
    // these embeddings are near-uniform random, the hardest case for LSH —
    // 2 planes / 4 buckets keeps the candidate pool ~25% and recall sane
    info(f"ANN recall@10 with 2 planes: $recall%.2f")
    assert(recall > 0.15, s"recall collapsed: $recall")
  }

  test("multi-table LSH strictly widens the candidate union: recall is " +
    "monotone in tables and clears the q24 floor at 6 planes") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(tables: Int): Double = {
      val pairs = Similarity.annTopK(queries, emb, "vec_id", "embedding",
          10, planes = 6, dim = 64, tables = tables)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (pairs intersect exact).size.toDouble / exact.size
    }
    val r1 = recallOf(1)
    val r4 = recallOf(4)
    info(f"ANN recall@10 at 6 planes: 1 table $r1%.2f, 4 tables $r4%.2f")
    assert(r4 >= r1, s"more tables must not lose recall: $r4 < $r1")
    assert(r4 >= 0.10, s"4-table recall under the q24 floor: $r4")
  }

  test("nearDupPairsEmbedding finds an injected duplicate vector") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dup = emb.filter($"vec_id" === 7L)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding", $"label")
    val pairs = Similarity.nearDupPairsEmbedding(
      emb.unionByName(dup), "vec_id", "embedding", threshold = 0.999)
    val found = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found.contains((7L, 100007L)))
  }

  test("centroids: exact per-label dimension means in dim order") {
    val df = Seq(
      (0, Seq(1.0f, 10.0f)), (0, Seq(3.0f, 20.0f)),
      (1, Seq(5.0f, 5.0f)))
      .toDF("label", "embedding")
    val got = Similarity.centroids(df, "label", "embedding")
      .as[(Int, Seq[Double])].collect().toMap
    assert(got == Map(0 -> Seq(2.0, 15.0), 1 -> Seq(5.0, 5.0)))
  }

  test("quantizeInt8: absmax grid, max element hits ±127, zero vector → 0s") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),   // maxabs 1.0 → 64 (rounded), -127, 32
      (2L, Seq(0.0f, 0.0f)))           // zero vector
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .orderBy($"vec_id", $"dim")
      .select($"vec_id", $"dim", $"q8").as[(Long, Int, Int)].collect().toList
    assert(got == List(
      (1L, 1, 64), (1L, 2, -127), (1L, 3, 32),
      (2L, 1, 0), (2L, 2, 0)))
    // every vector's largest-magnitude element lands exactly on ±127
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val maxPerVec = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .groupBy($"vec_id").agg(max(abs($"q8")).as("m"))
      .select($"m").distinct().as[Int].collect().toSet
    assert(maxPerVec == Set(127))
  }

  test("standardizeDims: exact z on a known column, NULL on constant dim") {
    val df = Seq(
      (1L, Seq(0.0f, 10.0f)),
      (2L, Seq(2.0f, 10.0f)),
      (3L, Seq(4.0f, 10.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.standardizeDims(df, "vec_id", "embedding")
      .orderBy($"vec_id", $"dim")
      .select($"vec_id", $"dim", $"z6")
      .as[(Long, Int, Option[Double])].collect()
    // dim 1: mean 2, σ² = 8/3 → z = ±1.224745 / 0
    val d1 = got.filter(_._2 == 1).map(_._3).toSeq
    assert(d1 == Seq(Some(-1.224745), Some(0.0), Some(1.224745)))
    // dim 2 constant: σ = 0 → guarded NULL (ANSI Spark raises on x/0)
    assert(got.filter(_._2 == 2).forall(_._3.isEmpty))
  }
}

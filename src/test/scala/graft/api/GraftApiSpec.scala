package graft.api

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.api.Graft._

class GraftApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "THE QUICK  brown fox jumps over the lazy dog near the river bank"),
    (3L, "an unrelated text about catalyst optimizer rules and shuffles"))
    .toDF("doc_id", "text")

  test("text facade: stats, exact dedup, near dedup") {
    val stats = docs.withTextStats()
    assert(stats.columns.toSet.intersect(
      Set("n_tokens", "n_bpeish", "quality", "lang_pred")).size == 4)

    assert(docs.dedupExact("doc_id").count() == 2) // 1 ≡ 2 normalized
    val near = docs.dedupNear("doc_id", threshold = 0.8)
    assert(near.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("corpus facade: normalize, split, pack, contamination sugar") {
    val cleaned = docs.withNormalizedText()
    assert(cleaned.columns.contains("clean"))
    val split = docs.withSplit("doc_id")
    assert(split.select("split").as[String].collect()
      .forall(Set("train", "val", "test")))
    val packed = docs.withColumn("shard", $"doc_id" % 2).packed("doc_id", "shard", 10)
    assert(packed.columns.contains("pack_id"))
    val contaminated = docs.filter($"doc_id" > 1L)
      .contaminatedBy(docs.filter($"doc_id" === 1L), "doc_id", n = 5)
    assert(contaminated.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("vector facade: topK through the implicit syntax") {
    val vecs = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val top = vecs.topKNeighbors(vecs.filter($"vec_id" === 0L), "vec_id", "embedding", 1)
    assert(top.select("neighbor_id").as[Long].head() == 1L)
  }

  test("flow facade: as-of join sugar") {
    val l = Seq(("A", java.sql.Timestamp.valueOf("2021-01-01 10:00:05"), 1))
      .toDF("k", "ts", "x")
    val r = Seq(("A", java.sql.Timestamp.valueOf("2021-01-01 10:00:01"), 9.0))
      .toDF("k", "ts", "v")
    val j = l.asofJoin(r, Seq("k"), "ts", Seq("v"))
    assert(j.select("asof_v").as[Double].head() == 9.0)
  }

  test("event facade: funnel, weighted median, bloom join sugar") {
    val t = (h: Int) => java.sql.Timestamp.valueOf(f"2024-01-08 $h%02d:00:00")
    val e = Seq((1L, "view", t(1)), (1L, "click", t(2)), (2L, "view", t(3)))
      .toDF("user_id", "event_type", "ts")
    val f = e.funnel("user_id", "event_type", "ts", Seq("view", "click"))
      .select("users").as[Long].collect().toSeq
    assert(f == Seq(2L, 1L))

    val wm = Seq(("g", 1.0, 1L, 1L), ("g", 9.0, 5L, 2L))
      .toDF("g", "v", "w", "id")
      .weightedMedian("g", "v", "w", Seq("id"))
      .select("weighted_median").as[Double].head()
    assert(wm == 9.0)

    val probe = spark.range(10).select($"id".as("k"))
    val build = Seq(3L, 7L).toDF("bk")
    val bj = probe.bloomJoin(build,
        org.apache.spark.sql.functions.col("k"), "bk", expectedKeys = 2L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(bj == Seq(3L, 7L))
  }

  test("round-4 facade: baskets, triangles, lm score, prefix jaccard, ab") {
    import org.apache.spark.sql.functions.col
    val baskets = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
      .toDF("b", "i")
    val pairs = baskets.cooccurrencePairs("b", "i")
    assert(pairs.select("support").as[Long].head() == 2L)

    val tris = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("s", "d")
      .triangleCounts("s", "d")
    assert(tris.count() == 3)

    val lm = docs.withLmScore("doc_id")
    assert(lm.columns.contains("lm_score") && lm.count() == 3)

    val jp = docs.jaccardPairsExact("doc_id", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(jp == Seq((1L, 2L)))

    val ab = Seq((0L, "purchase"), (1L, "view"))
      .toDF("user_id", "event_type")
      .withColumn("v", col("user_id") % 2)
      .abLift("v", "user_id", col("event_type") === "purchase")
    assert(ab.select("lift").as[Double].head() == -1.0)
  }

  test("quality facade: constraint audit + sketch rollup sugar") {
    import org.apache.spark.sql.functions.col
    import graft.ops.Constraints.{Bounds, NotNull, Unique}
    val t = Seq((1L, 1, 5.0), (1L, 1, 200.0), (2L, 1, 7.0))
      .toDF("k", "ln", "v")
    val rep = t.auditConstraints(
        NotNull("v"), Bounds("v", 0.0, 100.0), Unique(Seq("k", "ln")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("not_null:v" -> 0L, "bounds:v" -> 1L, "unique:k,ln" -> 1L))

    val est = t.distinctSketch(col("k"), 12, col("ln"))
      .sketchRollup("est", col("ln"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(est == Map(1 -> 2L))

    val hits = Seq((1L, "spark joins fast"), (2L, "rows and columns"))
      .toDF("doc_id", "text")
      .bm25TopK(Seq("spark"), k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(1L))
  }

  test("lake facade: lifecycle verbs incl. restore, as-of-time, txn family") {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory("graft_api_lake_")
    work.toFile.deleteOnExit()
    val dir = s"$work/t"
    spark.range(0, 30).select($"id".as("k"), lit(1L).as("v"),
      lit("a").as("pd")).write.partitionBy("pd").parquet(dir)
    graft.sources.CommitLog.init(spark, dir)
    val t = Graft.lake(spark, dir)
    val v1 = t.version
    val t1 = System.currentTimeMillis()
    Thread.sleep(5)
    t.upsert(spark.range(0, 30).select($"id".as("k"), lit(9L).as("v"),
      lit("a").as("pd")), Seq("k"), "pd")
    assert(t.read.filter($"v" === 9L).count() == 30L)
    assert(t.asOfTime(t1).filter($"v" === 9L).count() == 0L)
    t.restore(v1)
    assert(t.read.filter($"v" === 9L).count() == 0L)
    // txn family sugar: pin this table, read through the pin
    val txn = s"$work/txn"
    val fam = Graft.txnFamily(spark, txn)
    fam.commit(Map(dir -> t.version), batchId = Some(1L))
    assert(fam.read(dir).count() == 30L)
    assert(fam.pinOf(dir) == t.version)
  }

  test("vector facade: build, update, and search the persisted index") {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory("graft_api_pq_")
    work.toFile.deleteOnExit()
    val dir = s"$work/pq"
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    emb.buildVectorIndex(dir, "vec_id", "embedding", nList = 4, m = 8, k = 4)
    val got = Graft.searchVectorIndex(spark, dir,
      emb.filter($"vec_id" < 2), emb, "vec_id", "embedding", k = 5, nProbe = 2)
    assert(got.count() > 0)
    // churn through the facade: remove one id, confirm it stops matching
    emb.filter($"vec_id" === 7L)
      .select($"vec_id", lit(null).cast("array<float>").as("embedding"))
      .updateVectorIndex(dir, "vec_id", "embedding")
    val after = Graft.searchVectorIndex(spark, dir,
      emb.filter($"vec_id" < 2), emb, "vec_id", "embedding", k = 50, nProbe = 4)
      .filter($"neighbor_id" === 7L)
    assert(after.count() == 0L, "removed vector still served")
  }
}

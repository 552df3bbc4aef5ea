package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("IVF top-k: candidates come from probed cells, exact-cosine ranked") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val index = IvfIndex.build(emb, "vec_id", "embedding", nList = 8)
    try {
    // every corpus vector landed in exactly one of 8 cells
    assert(index.assigned.select("cell").distinct().count() <= 8)
    assert(index.assigned.count() == emb.count())

    val queries = emb.filter($"vec_id" < 10)
    val ann = IvfIndex.topK(queries, "vec_id", "embedding", index, k = 10, nProbe = 3)
    val rows = ann.collect()
    assert(rows.forall(r => r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 10))

    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val annPairs = ann.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (annPairs intersect exact).size.toDouble / exact.size
    info(f"IVF recall@10, 8 cells, 3 probes: $recall%.2f")
    assert(recall > 0.2, s"IVF recall collapsed: $recall")
    } finally index.close()
  }

  test("persisted index serves IDENTICAL results to the in-memory " +
    "index, reads only probed cells, and routes through annTopK") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val index = IvfIndex.build(emb, "vec_id", "embedding", nList = 8)
    val work = java.nio.file.Files.createTempDirectory("graft_ivf_")
    work.toFile.deleteOnExit()
    val dir = s"$work/ivf"
    try {
      IvfIndex.save(spark, index, dir)
      val queries = emb.filter($"vec_id" < 10)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "neighbor_id", "rank")
          .as[(Long, Long, Int)].collect().toSet
      val mem = pairs(IvfIndex.topK(queries, "vec_id", "embedding",
        index, k = 10, nProbe = 3))
      val persisted = pairs(IvfIndex.topKPersisted(spark, dir, queries,
        "vec_id", "embedding", k = 10, nProbe = 3))
      assert(persisted == mem,
        "persisted serving must be bit-identical to in-memory serving")
      // the routed annTopK entry point is the same plan
      val routed = pairs(Similarity.annTopK(queries, emb, "vec_id",
        "embedding", k = 10, index = Some(dir)))
      assert(routed == persisted)
      // centroids round-trip exactly through the props codec
      val loaded = IvfIndex.loadCentroids(spark, dir)
      assert(loaded.size == index.centroids.size &&
        loaded.zip(index.centroids).forall { case (a, b) =>
          a.sameElements(b)
        }, "centroid literals must round-trip bit-exactly")
    } finally index.close()
  }

  test("nProbe = nList degenerates to exact search") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(100)
    val index = IvfIndex.build(emb, "vec_id", "embedding", nList = 4)
    try {
      val queries = emb.filter($"vec_id" < 3)
      val ann = IvfIndex.topK(queries, "vec_id", "embedding", index, k = 5, nProbe = 4)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      assert(ann == exact)
    } finally index.close()
  }
}

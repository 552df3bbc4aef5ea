package graft.sim

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.CommitLog
import graft.tables.Tables

/** [[PqIndex.save]]/[[PqIndex.loadModel]]/persisted serving: the lake
  * copy of the index must serve the SAME answers as the session copy it
  * was saved from, the model must round-trip bit-exactly through the
  * commit props, and the cell probe must actually prune files.
  */
class PqPersistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    s"$d/pq"
  }

  test("model round-trips through props bit for bit") {
    val emb = Tables.embeddings(spark, sf).limit(80)
    val index = PqIndex.build(emb, "vec_id", "embedding",
      nList = 4, m = 8, k = 4)
    val dir = tmp("graft_pqp_model_")
    try {
      PqIndex.save(spark, index, dir, numFiles = 4)
      val loaded = PqIndex.loadModel(spark, dir)
      assert(loaded.m == index.m && loaded.k == index.k &&
        loaded.subDim == index.subDim)
      assert(loaded.coarseCenters.map(_.toSeq) ==
        index.coarseCenters.map(_.toSeq))
      assert(loaded.codebooks.map(_.map(_.toSeq)) ==
        index.codebooks.map(_.map(_.toSeq)))
    } finally index.close()
  }

  test("persisted ADC serve ≡ in-memory serve, and rerank too") {
    val emb = Tables.embeddings(spark, sf)
    val index = PqIndex.build(emb, "vec_id", "embedding",
      nList = 8, m = 8, k = 16)
    val dir = tmp("graft_pqp_serve_")
    try {
      PqIndex.save(spark, index, dir, numFiles = 4)
      val q = emb.filter($"vec_id" < 5)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select($"query_id", $"neighbor_id", $"rank", round($"sim", 9))
        .orderBy($"query_id", $"rank")
        .collect().map(_.toSeq).toSeq
      assert(
        rows(PqIndex.topKPersisted(spark, dir, q, "vec_id", "embedding",
          k = 10, nProbe = 3)) ==
        rows(PqIndex.topK(q, "vec_id", "embedding", index,
          k = 10, nProbe = 3)))
      assert(
        rows(PqIndex.topKRerankPersisted(spark, dir, q, emb,
          "vec_id", "embedding", k = 10, nProbe = 3)) ==
        rows(PqIndex.topKRerank(q, emb, "vec_id", "embedding", index,
          k = 10, nProbe = 3)))
    } finally index.close()
  }

  test("incremental update ≡ full re-encode under the frozen model, " +
      "bit for bit; removals land; replay is idempotent") {
    val emb = Tables.embeddings(spark, sf)
    val index = PqIndex.build(emb, "vec_id", "embedding",
      nList = 8, m = 8, k = 16)
    val dirChurn = tmp("graft_pqp_upd_churn_")
    val dirFull = tmp("graft_pqp_upd_full_")
    try {
      PqIndex.save(spark, index, dirChurn, numFiles = 4)
      PqIndex.save(spark, index, dirFull, numFiles = 4)
      // churn: edit ids 10..14 (deterministically different vectors),
      // remove 15..16 (null vector)
      val churn = emb.filter($"vec_id".between(10, 16)).select($"vec_id",
        when($"vec_id" <= 14, reverse($"embedding")).otherwise(lit(null))
          .as("embedding"))
      PqIndex.update(spark, dirChurn, churn, "vec_id", "embedding")
      // the reference: the WHOLE post-churn corpus re-encoded through
      // the same public path under the same frozen model
      val postCorpus = emb.filter(!$"vec_id".between(15, 16)).select($"vec_id",
        when($"vec_id".between(10, 14), reverse($"embedding"))
          .otherwise($"embedding").as("embedding"))
      PqIndex.update(spark, dirFull,
        postCorpus.unionByName(emb.filter($"vec_id".between(15, 16))
          .select($"vec_id", lit(null).cast("array<float>").as("embedding"))),
        "vec_id", "embedding")
      def table(dir: String) = CommitLog.read(spark, dir)
        .select($"nn_id", $"cell", $"codes")
        .as[(Long, Int, Seq[Int])].collect().toSet
      val churned = table(dirChurn)
      assert(churned == table(dirFull),
        "churn-bounded update diverged from the full re-encode")
      assert(!churned.exists(r => r._1 == 15L || r._1 == 16L),
        "removed ids still in the index")
      // replay: applying the same churn again changes nothing
      PqIndex.update(spark, dirChurn, churn, "vec_id", "embedding")
      assert(table(dirChurn) == churned, "update replay was not idempotent")
      // and the serving paths agree
      val q = emb.filter($"vec_id" < 5)
      def rows(dir: String) = PqIndex.topKPersisted(spark, dir, q,
          "vec_id", "embedding", k = 10, nProbe = 3)
        .select($"query_id", $"neighbor_id", $"rank", round($"sim", 9))
        .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
      assert(rows(dirChurn) == rows(dirFull))
    } finally index.close()
  }

  test("update's old-row probe is Bloom-pruned, not a full index scan") {
    val emb = Tables.embeddings(spark, sf)
    val index = PqIndex.build(emb, "vec_id", "embedding",
      nList = 8, m = 8, k = 16)
    val dir = tmp("graft_pqp_upd_prune_")
    try {
      PqIndex.save(spark, index, dir, numFiles = 8)
      val (_, (read, total)) =
        CommitLog.scanPointsIn(spark, dir, "nn_id", Seq(3L))
      assert(total >= 4, s"fixture produced too few files ($total)")
      assert(read < total, s"no nn_id pruning: read $read of $total")
    } finally index.close()
  }

  test("the cell probe opens only the probed cells' files") {
    val emb = Tables.embeddings(spark, sf)
    val index = PqIndex.build(emb, "vec_id", "embedding",
      nList = 8, m = 8, k = 16)
    val dir = tmp("graft_pqp_prune_")
    try {
      PqIndex.save(spark, index, dir, numFiles = 8)
      val (slice, (read, total)) =
        CommitLog.scanPointsIn(spark, dir, "cell", Seq(0, 1))
      assert(total >= 4, s"fixture produced too few files ($total)")
      assert(read < total, s"no pruning: read $read of $total")
      // the prune lost nothing: every row of cells 0/1 is in the slice
      val want = index.encoded.filter($"cell".isin(0, 1)).count()
      assert(slice.count() == want)
    } finally index.close()
  }
}

package graft.text

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** Index-routed hybrid retrieval ([[Retrieval.hybridTopK]]): with every
  * IVF cell probed, the routed fusion must EQUAL the corpus-scan
  * fusion bit for bit (both legs rank on rounded scores with id
  * tiebreaks — the rank rule is total, so equality is exact, not
  * approximate); with fewer probes the lexical leg is unchanged and
  * the result degrades gracefully (recall, never errors). The
  * registered q197 shares q194's DuckDB oracle — this spec is the fast
  * in-suite twin of that gate. */
class HybridRoutedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Deterministic 3-term queries over the corpus vocabulary — the
    * q139 fixture's shape, scoped down to 5 queries. */
  private val termQueries: Seq[(Long, String, Int)] = {
    val v = Seq("data", "model", "train", "test", "learn",
      "spark", "index", "merge", "join", "scan")
    (0 until 5).flatMap { q =>
      Seq(v(q), v(q + 3), v(q + 5)).zipWithIndex
        .map { case (t, p) => (q.toLong, t, p) }
    }
  }

  private def fixture(): (String, String) = {
    val work = Files.createTempDirectory("graft_hybrid_").toString
    val text = s"$work/text"
    val vec = s"$work/vec"
    InvertedIndex.build(spark, Tables.documents(spark, sf),
      "doc_id", "text", text)
    graft.sim.IvfIndex.save(spark, graft.sim.IvfIndex.build(
      Tables.embeddings(spark, sf), "vec_id", "embedding", nList = 4),
      vec)
    (text, vec)
  }

  /** The corpus-scan twin: bm25Batch + brute-force rounded cosine,
    * fused by the same RRF — the q194 shape rebuilt on this fixture's
    * query set. */
  private def rawFusion(k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Retrieval.bm25Batch(Tables.documents(spark, sf),
      termQueries.toDF("query_id", "term", "pos"),
      "doc_id", "text", k = k, arity = 3)
      .withColumn("trank", row_number().over(
        Window.partitionBy($"query_id")
          .orderBy($"score".desc, $"doc_id")))
      .select($"query_id", $"doc_id", $"trank")
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"),
        $"embedding".cast("array<double>").as("qv"))
    val c = emb.select($"vec_id".as("neighbor_id"),
      $"embedding".cast("array<double>").as("cv"))
    val scored = c.join(broadcast(q), $"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        round(graft.sim.Similarity.cosine($"qv", $"cv"), 6).as("sim6"))
    val v = graft.functions.NativeTopK.topKPerGroup(
      scored, Seq("query_id"), $"sim6", $"neighbor_id", k,
      sortName = "sim6", idName = "neighbor_id")
      .select($"query_id", $"neighbor_id".as("doc_id"),
        $"rank".as("vrank"))
    t.join(v, Seq("query_id", "doc_id"), "full_outer")
      .select($"query_id", $"doc_id",
        (coalesce(lit(1.0) / (lit(60) + $"trank"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + $"vrank"), lit(0.0))).as("rrf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"rrf".desc, $"doc_id")))
      .filter($"rank" <= k)
      .select($"query_id", $"doc_id", $"rank", round($"rrf", 6).as("rrf"))
  }

  test("routed ≡ raw: with all cells probed the index-served fusion " +
    "equals the corpus-scan fusion exactly") {
    val (text, vec) = fixture()
    val routed = Retrieval.hybridTopK(spark, text, vec,
      termQueries.toDF("query_id", "term", "pos"),
      Tables.embeddings(spark, sf).filter($"vec_id" < 5),
      "vec_id", "embedding", k = 10, arity = 3, nProbe = 4,
      excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    val raw = rawFusion(10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    assert(routed == raw,
      s"routed diverged from raw:\nrouted-only: ${routed -- raw}\n" +
        s"raw-only: ${raw -- routed}")
  }

  test("fewer probes degrade gracefully: the lexical leg is unchanged, " +
    "results stay well-formed, vector recall may drop") {
    val (text, vec) = fixture()
    val narrow = Retrieval.hybridTopK(spark, text, vec,
      termQueries.toDF("query_id", "term", "pos"),
      Tables.embeddings(spark, sf).filter($"vec_id" < 5),
      "vec_id", "embedding", k = 10, arity = 3, nProbe = 1,
      excludeSelf = true)
    val rows = narrow.collect()
    assert(rows.nonEmpty)
    // per-query ranks are dense 1..n with no duplicates
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(2)).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"ranks not dense: $ranks")
    }
    // the corpus was never scanned: both legs' plans read index tables
    // only (documents.parquet absent from the scan's files)
    val plan = Retrieval.hybridTopK(spark, text, vec,
      termQueries.toDF("query_id", "term", "pos"),
      Tables.embeddings(spark, sf).filter($"vec_id" < 5),
      "vec_id", "embedding", k = 10, arity = 3, nProbe = 1,
      excludeSelf = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"the lexical leg re-scanned the corpus:\n$plan")
  }

  test("self-exclusion is OPT-IN: by default a vector-leg hit whose doc " +
    "id equals the query id is a legitimate result (independent query " +
    "id spaces must not lose it), and it tops the leg at similarity 1") {
    val (text, vec) = fixture()
    val byDefault = Retrieval.hybridTopK(spark, text, vec,
      termQueries.toDF("query_id", "term", "pos"),
      Tables.embeddings(spark, sf).filter($"vec_id" < 5),
      "vec_id", "embedding", k = 10, arity = 3, nProbe = 4)
      .select($"query_id", $"doc_id").as[(Long, Long)].collect()
    // queries here ARE corpus vectors, so each query's own doc — cosine
    // exactly 1.0 — must appear when exclusion is off…
    (0L until 5L).foreach { q =>
      assert(byDefault.contains((q, q)),
        s"default hybridTopK dropped the id-equal doc for query $q — " +
          "self-exclusion leaked into the independent-id-space default")
    }
    // …and must vanish when the twin convention opts in
    val optedIn = Retrieval.hybridTopK(spark, text, vec,
      termQueries.toDF("query_id", "term", "pos"),
      Tables.embeddings(spark, sf).filter($"vec_id" < 5),
      "vec_id", "embedding", k = 10, arity = 3, nProbe = 4,
      excludeSelf = true)
      .select($"query_id", $"doc_id").as[(Long, Long)].collect()
    assert(!optedIn.exists { case (q, dId) => q == dId })
  }
}

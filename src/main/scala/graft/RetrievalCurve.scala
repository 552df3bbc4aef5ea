package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The routed-hybrid-retrieval RECALL/LATENCY curve — the nProbe dial
  * measured against the exact corpus-scan fusion (q194's shape): for
  * each probe count, serve [[graft.text.Retrieval.hybridTopK]] from
  * the persisted indexes and report wall time plus recall@10 of the
  * fused (query, doc) pairs vs the exact fusion. Prints one
  * `[retrieval-curve]` line per point for SCALE.md. nProbe = nList is
  * the EXACT configuration (recall 1.0 by construction — the q197
  * oracle gate proves it bit-level); lower probes are the production
  * latency dial, same trade [[sim.IvfIndex]] serves ANN with. */
object RetrievalCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.tables.Tables.documents(spark, sfDir)
    val emb = graft.tables.Tables.embeddings(spark, sfDir)
    val work = java.nio.file.Files.createTempDirectory("graft_curve_")
    val textIdx = s"$work/text"; val vecIdx = s"$work/vec"
    val nList = 8
    graft.text.InvertedIndex.build(spark, docs, "doc_id", "text", textIdx)
    graft.sim.IvfIndex.save(spark, graft.sim.IvfIndex.build(
      emb, "vec_id", "embedding", nList = nList), vecIdx)

    // the q139/q194 fixture's first five 3-term queries
    val vocab = Seq("data", "model", "train", "test", "learn", "neural",
      "deep", "graph", "node", "edge", "tree", "hash", "sort", "join",
      "scan", "index", "cache", "disk", "net", "web", "text", "code",
      "word", "line", "page", "big", "sort2", "query", "fast")
    val combos = for {
      i <- vocab.indices; j <- i + 1 until vocab.size
      l <- j + 1 until vocab.size
    } yield Seq(vocab(i), vocab(j), vocab(l))
    val termQueries = (0 until 5).flatMap { q =>
      combos(q * 36).zipWithIndex.map { case (t, p) => (q.toLong, t, p) }
    }.toDF("query_id", "term", "pos")
    val vecQueries = emb.filter($"vec_id" < 5)

    def run(nProbe: Int): (Double, Set[(Long, Long)]) = {
      val t0 = System.nanoTime()
      val rows = graft.text.Retrieval.hybridTopK(spark, textIdx, vecIdx,
        termQueries, vecQueries, "vec_id", "embedding",
        k = 10, arity = 3, nProbe = nProbe, excludeSelf = true)
        .select($"query_id", $"doc_id").as[(Long, Long)].collect().toSet
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    run(nList) // warm the fixtures/JIT out of the measurement
    val exact = run(nList)._2
    Seq(1, 2, 4, nList).foreach { p =>
      val (dt, got) = run(p)
      val recall = got.intersect(exact).size.toDouble / exact.size
      println(f"[retrieval-curve] nProbe=$p%d recall@10=$recall%.3f " +
        f"serve=${dt}%.2f s (exact baseline = nProbe=$nList)")
    }
    spark.stop()
  }
}

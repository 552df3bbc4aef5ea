package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor: a coarse KMeans quantizer
  * partitions the corpus into nList cells; a query probes only its
  * nProbe nearest cells and reranks candidates by exact cosine.
  *
  * Scale shape: the corpus is clustered once (MLlib KMeans — itself a
  * distributed fit), assignments live with the vectors (prediction
  * column ⇒ can be a partition/bucket key at rest), and the probe join
  * is an equi-join on the int cell id — candidates ≈ corpus·(nProbe/
  * nList) instead of the full scan. Centroids (nList × dim floats) are
  * driver/broadcast-sized by construction.
  *
  * [[save]]/[[topKPersisted]] make the index a LAKE TABLE (the
  * [[PqIndex]] discipline): the assignment table commits
  * range-clustered by cell with per-file cell Bloom filters and the
  * centroids ride the commit as props, so a standing corpus pays the
  * cluster+assign pass ONCE and every later session serves by opening
  * only the probed cells' files. */
object IvfIndex {

  final case class Index(centroids: IndexedSeq[Array[Double]],
      assigned: DataFrame) {
    /** Release the cached assignment table when the index is retired. */
    def close(): Unit = { assigned.unpersist(); () }
  }

  /** Fit the coarse quantizer and assign every corpus vector to a cell.
    *
    * The quantizer trains on a bounded sample (`trainCap` rows, seeded) —
    * centroid quality saturates long before the full corpus is seen, and
    * the iterative fit (10 passes) must never scan 100 TB; only the
    * single-pass assignment touches every vector. Same trade FAISS makes
    * for IVF training. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nList: Int, seed: Long = 11L, trainCap: Long = 20000L): Index = {
    // cache the projected corpus through the build (count + fit sample +
    // assignment would otherwise each re-scan it), and cache the
    // assignment table itself — it is the whole point of the index, and
    // every topK probe reuses it (Index.close() releases it)
    val feats = corpus.select(col(idCol).as("nn_id"),
      col(vecCol).cast("array<double>").as("nn_vec"))
      .withColumn("features", array_to_vector(col("nn_vec")))
      .cache()
    val n = feats.count()
    val train =
      if (n <= trainCap) feats
      else feats.sample(withReplacement = false, trainCap.toDouble / n, seed)
    val model = new KMeans().setK(nList).setSeed(seed).setMaxIter(10)
      .fit(train)
    val assigned = model.transform(feats)
      .select(col("nn_id"), col("nn_vec"), col("prediction").as("cell"))
      .cache()
    assigned.count() // materialize while feats is still cached
    feats.unpersist()
    Index(model.clusterCenters.map(_.toArray).toIndexedSeq, assigned)
  }

  /** Probe cell ids for each query vector: the nProbe nearest centroids
    * (exact L2 against the driver-sized centroid set, unrolled as
    * expressions — no UDF). */
  private def probeCells(queries: DataFrame, idCol: String, vecCol: String,
      centroids: IndexedSeq[Array[Double]], nProbe: Int): DataFrame = {
    val distStructs = centroids.zipWithIndex.map { case (c, cid) =>
      val lit_c = typedLit(c.toSeq)
      val d2 = aggregate(
        zip_with(col("qv"), lit_c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
      struct(d2.as("d2"), lit(cid).as("cell"))
    }
    queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("probes",
        slice(array_sort(array(distStructs: _*)), 1, nProbe))
      .select(col("query_id"), col("qv"),
        explode(col("probes.cell")).as("cell"))
  }

  private def rank(assigned: DataFrame, probes: DataFrame,
      k: Int): DataFrame = {
    val scored = assigned.join(probes, Seq("cell"))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id").as("neighbor_id"),
        Similarity.cosine(col("qv"), col("nn_vec")).as("sim"))
    Similarity.rankTopK(scored, k)
  }

  /** ANN top-k through the IVF index. */
  def topK(queries: DataFrame, idCol: String, vecCol: String,
      index: Index, k: Int, nProbe: Int): DataFrame =
    rank(index.assigned,
      probeCells(queries, idCol, vecCol, index.centroids, nProbe), k)

  // ------------------------------------------------------- persistence

  /** Persist `index` as a commit-logged table at `dir` (fresh
    * directory): rows (nn_id, cell, nn_vec) range-clustered by cell so
    * a cell's vectors live in few files, per-file Bloom filters on cell
    * for probe pruning, centroids in the table props — one atomic,
    * versioned, vacuumable unit (the [[PqIndex.save]] shape, keeping
    * raw vectors for exact in-cell scoring where PQ keeps codes). */
  def save(spark: org.apache.spark.sql.SparkSession, index: Index,
      dir: String, numFiles: Int = 8): Unit = {
    import graft.sources.CommitLog
    index.assigned
      .repartitionByRange(numFiles, col("cell"))
      .sortWithinPartitions("cell", "nn_id")
      .write.parquet(dir)
    val perFile = index.assigned.count() / math.max(1, numFiles) + 1L
    CommitLog.init(spark, dir, bloomCols = Seq("cell"),
      bloomExpect = math.max(16L, perFile),
      props = Map("ivf.centroids" -> PqIndex.renderMatrix(index.centroids)))
    ()
  }

  /** The persisted centroids — kilobytes of props, no data files
    * opened. */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
      dir: String): IndexedSeq[Array[Double]] = {
    val p = graft.sources.CommitLog.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"$dir holds no index commit log")).props
    require(p.contains("ivf.centroids"),
      s"$dir carries no ivf.centroids prop — not an IVF index table")
    PqIndex.parseMatrix(p("ivf.centroids"))
  }

  /** ANN top-k served from a PERSISTED index: probe cells resolve
    * against the props-resident centroids, and the assignment table is
    * read through the committed cell Blooms — only the probed cells'
    * files open, at any index size. Scores are identical to [[topK]]
    * over the same index contents (IvfIndexSpec pins it). */
  def topKPersisted(spark: org.apache.spark.sql.SparkSession,
      dir: String, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val (assigned, probes) =
      candidatesPersisted(spark, dir, queries, idCol, vecCol, nProbe)
    rank(assigned, probes, k)
  }

  /** The PROBED slice of a persisted index, pre-scoring: the Bloom-
    * pruned assignment rows of the queries' probe cells plus the probe
    * table itself (query_id, qv, cell) — the building block for
    * callers that score candidates their OWN way (the hybrid-retrieval
    * fusion ranks on the 6-decimal-rounded cosine to stay
    * bit-reproducible against its oracle twin, where [[topK]]'s raw
    * ranking serves the recall-floored ANN path). */
  def candidatesPersisted(spark: org.apache.spark.sql.SparkSession,
      dir: String, queries: DataFrame, idCol: String, vecCol: String,
      nProbe: Int): (DataFrame, DataFrame) = {
    import graft.sources.CommitLog
    val centroids = loadCentroids(spark, dir)
    val probes = probeCells(queries, idCol, vecCol, centroids, nProbe)
    val cells: Seq[Any] = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0): Any).toSeq
    val assigned =
      if (cells.isEmpty) CommitLog.read(spark, dir).limit(0)
      else CommitLog.scanPointsIn(spark, dir, "cell", cells)._1
    (assigned, probes)
  }
}

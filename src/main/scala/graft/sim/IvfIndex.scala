package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame}
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
  */
object IvfIndex {

  final case class Index(model: org.apache.spark.ml.clustering.KMeansModel,
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
    Index(model, assigned)
  }

  /** Probe cell ids for each query vector: the nProbe nearest centroids
    * (exact L2 against the driver-sized centroid set, unrolled as
    * expressions — no UDF). */
  private def probeCells(queries: DataFrame, idCol: String, vecCol: String,
      index: Index, nProbe: Int): DataFrame = {
    val centroids = index.model.clusterCenters.zipWithIndex
    val distStructs = centroids.map { case (c, cid) =>
      val lit_c = typedLit(c.toArray.toSeq)
      val d2 = aggregate(
        zip_with(col("qv"), lit_c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
      struct(d2.as("d2"), lit(cid).as("cell"))
    }
    queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("probes",
        slice(array_sort(array(distStructs.toIndexedSeq: _*)), 1, nProbe))
      .select(col("query_id"), col("qv"),
        explode(col("probes.cell")).as("cell"))
  }

  /** ANN top-k through the IVF index. */
  def topK(queries: DataFrame, idCol: String, vecCol: String,
      index: Index, k: Int, nProbe: Int): DataFrame = {
    val q = probeCells(queries, idCol, vecCol, index, nProbe)
    val scored = index.assigned.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id").as("neighbor_id"),
        Similarity.cosine(col("qv"), col("nn_vec")).as("sim"))
    Similarity.rankTopK(scored, k)
  }
}

package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF + product-quantization ANN (the FAISS IVFPQ layout, Spark-first):
  * a coarse KMeans quantizer buckets the corpus into `nList` cells, and
  * each vector is stored ONLY as `m` small sub-codebook codes — at rest
  * the index carries (id, cell, m codes), never the raw floats. For a
  * 64-dim float corpus with m=8, that is 256 bytes → 8 bytes per vector:
  * the representation that still fits a cluster's shuffle/cache tier when
  * the raw embedding table is 100 TB.
  *
  * Query path: probe the `nProbe` nearest cells (equi-join on the int
  * cell id, same shape as [[IvfIndex]]), score candidates by asymmetric
  * distance — the query precomputes an m×k lookup table of sub-dot
  * products against the codebooks, and each candidate's score is m
  * array lookups summed, no vector arithmetic per pair — then
  * bounded-heap top-k. An optional exact re-rank re-reads raw vectors
  * for only the ADC survivors (an id equi-join, candidate-set-sized).
  *
  * All vectors are L2-normalized at build/query time, so the ADC sum of
  * sub-dot products approximates cosine similarity: dot(q, recon(x)) ≈
  * cos(q, x) with reconstruction error bounded by the per-subspace
  * quantization residual.
  *
  * Everything is Catalyst expressions — codebooks are driver-sized
  * (m·k·subDim doubles) and enter the plan as literals; encoding, the
  * LUT, and ADC scoring all run inside codegen with no UDF.
  */
object PqIndex {

  /** The driver-sized trained model: coarse centroids + sub-codebooks.
    * Everything needed to encode, probe, and build ADC LUTs — the part
    * of the index that enters plans as literals. */
  final case class Model(
      coarseCenters: IndexedSeq[Array[Double]],         // nList × dim
      codebooks: IndexedSeq[IndexedSeq[Array[Double]]], // m × k × subDim
      m: Int, k: Int, subDim: Int)

  final case class Index(model: Model, encoded: DataFrame) {
    def coarseCenters: IndexedSeq[Array[Double]] = model.coarseCenters
    def codebooks: IndexedSeq[IndexedSeq[Array[Double]]] = model.codebooks
    def m: Int = model.m
    def k: Int = model.k
    def subDim: Int = model.subDim
    /** Release the cached code table when the index is retired. */
    def close(): Unit = { encoded.unpersist(); () }
  }

  /** argmin cell id over a driver-sized centroid set, as an expression
    * (the sorted-struct idiom; ties to the lower cell id). */
  private def nearestCell(v: Column, centers: IndexedSeq[Array[Double]]): Column = {
    val cands = centers.zipWithIndex.map { case (c, cid) =>
      struct(l2ToLit(v, c).as("d2"), lit(cid).as("cell"))
    }
    array_sort(array(cands: _*)).getItem(0).getField("cell")
  }

  /** L2-normalize an array<double> column; zero vectors pass through as
    * zeros (they then score 0 against everything, like cosine). */
  private def normalize(v: Column): Column = {
    val n = sqrt(aggregate(zip_with(v, v, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x))
    when(n > 0, transform(v, x => x / n)).otherwise(v)
  }

  private def subVec(v: Column, j: Int, subDim: Int): Column =
    slice(v, j * subDim + 1, subDim)

  private def l2ToLit(v: Column, center: Array[Double]): Column =
    aggregate(zip_with(v, typedLit(center.toSeq), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Seeded Lloyd's k-means on a driver-resident point set: distinct-ish
    * seeded init (a shuffled prefix), argmin assignment, mean update;
    * clusters that empty out keep their previous centroid. Deterministic
    * for a given (points, k, seed). */
  private[sim] def lloyd(points: Array[Array[Double]], k: Int, seed: Long,
      iters: Int): IndexedSeq[Array[Double]] = {
    require(points.nonEmpty, "cannot fit a codebook on an empty sample")
    val d = points.head.length
    val rng = new scala.util.Random(seed)
    val init = rng.shuffle(points.indices.toVector).take(k).map(i => points(i).clone())
    var centers: IndexedSeq[Array[Double]] =
      if (init.size >= k) init
      else init ++ Vector.fill(k - init.size)(init(rng.nextInt(init.size)).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          var dist = 0.0; var i = 0
          while (i < d) { val t = p(i) - centers(c)(i); dist += t * t; i += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        var i = 0
        while (i < d) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      centers = (0 until k).map { c =>
        if (counts(c) == 0) centers(c)
        else { val out = new Array[Double](d)
          var i = 0
          while (i < d) { out(i) = sums(c)(i) / counts(c); i += 1 }
          out }
      }
    }
    centers
  }

  /** Train the coarse quantizer + m sub-codebooks and encode the corpus.
    *
    * Like [[IvfIndex.build]], every iterative fit trains on a bounded
    * seeded sample (`trainCap`) — only the single-pass encode touches
    * each vector once. The vector dimension must divide evenly into `m`
    * subspaces. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nList: Int, m: Int, k: Int,
      seed: Long = 11L, trainCap: Long = 20000L): Index = {
    val feats = featize(corpus, idCol, vecCol).cache()
    val n = feats.count()
    val dim = feats.select(size(col("nn_vec"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    // ALL fits (coarse + m sub-codebooks) train on the driver over one
    // bounded sample: trainCap rows × dim doubles is ≤ ~10 MB by
    // construction (the broadcast-sized-collect adaptivity, as in
    // connectedComponents' small-graph path), and seeded Lloyd loops
    // over ≤20k points are microseconds-per-iteration — distributed
    // fits on a driver-sized sample would cost 9 job launches to
    // cluster data that fits in one L2 cache. What MUST be distributed
    // is the corpus-wide assignment/encode pass, and it is: centroids
    // re-enter the plan as literals and the argmin runs as expressions
    // on every executor.
    val train =
      if (n <= trainCap) feats
      else feats.sample(withReplacement = false, trainCap.toDouble / n, seed)
    val sampleVecs = train.select(col("nn_vec")).collect()
      .map(_.getSeq[Double](0).toArray)
    val coarseCenters = lloyd(sampleVecs, nList, seed, iters = 10)
    val codebooks = (0 until m).map { j =>
      val pts = sampleVecs.map(v => java.util.Arrays.copyOfRange(
        v, j * subDim, (j + 1) * subDim))
      lloyd(pts, k, seed + 1 + j, iters = 10)
    }

    val model = Model(coarseCenters, codebooks, m, k, subDim)
    val encoded = encodeFeats(feats, model).cache()
    encoded.count() // materialize while feats is still cached
    feats.unpersist()
    Index(model, encoded)
  }

  /** Encode normalized feature rows (nn_id, nn_vec) into (nn_id, cell,
    * codes) under a FROZEN model — per subspace, argmin_{c}
    * ||subvec − codebook(j)(c)||² via the sorted-struct idiom (k
    * structs, sort, take head), pure expressions, ties to the lower
    * code id. Shared by [[build]]'s corpus pass and [[update]]'s
    * churn-bounded re-encode, so both produce bit-identical codes for
    * the same vector. */
  private def encodeFeats(feats: DataFrame, model: Model): DataFrame = {
    val codeCols = (0 until model.m).map { j =>
      val sv = subVec(col("nn_vec"), j, model.subDim)
      val cands = (0 until model.k).map { c =>
        struct(l2ToLit(sv, model.codebooks(j)(c)).as("d2"), lit(c).as("code"))
      }
      array_sort(array(cands: _*)).getItem(0).getField("code")
    }
    feats.select(col("nn_id"),
      nearestCell(col("nn_vec"), model.coarseCenters).as("cell"),
      array(codeCols: _*).as("codes"))
  }

  /** (id, vec) → normalized (nn_id, nn_vec) — the same projection
    * [[build]] applies before training/encoding. */
  private def featize(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    corpus.select(col(idCol).as("nn_id"),
      normalize(col(vecCol).cast("array<double>")).as("nn_vec"))

  /** Probe cell ids per query (nProbe nearest coarse centroids, exact L2
    * against the driver-sized centroid set) plus the query's flattened
    * ADC lookup table: lut[j·k + c] = dot(q_sub_j, codebook(j)(c)). */
  private[sim] def probeDebug(queries: DataFrame, idCol: String,
      vecCol: String, model: Model, nProbe: Int): DataFrame =
    probesWithLut(queries, idCol, vecCol, model, nProbe)

  private def probesWithLut(queries: DataFrame, idCol: String, vecCol: String,
      model: Model, nProbe: Int): DataFrame = {
    // Computed DRIVER-SIDE: a probe batch is driver-sized by contract
    // (this method's result was already collected for cell planning),
    // the model is driver-resident, and the LUT is q·m·k doubles of
    // plain arithmetic. The former formulation built the same math as a
    // LITERAL EXPRESSION TREE (m·k·subDim nodes per plan) whose
    // analysis/codegen dominated serving latency — ~0.7 s of a ~1.3 s
    // probe at sf0.1, repaid on every call. The loops below replicate
    // the expression semantics exactly (normalize's zero-vector
    // pass-through, left-to-right fold accumulation, probe ties to the
    // lower cell id), so probes and LUTs are bit-identical to the old
    // path — PqPersistSpec's persisted ≡ in-memory pin and q131's
    // recall floors hold unchanged.
    val spark = queries.sparkSession
    val src = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val idType = src.schema("query_id").dataType
    val out = new java.util.ArrayList[org.apache.spark.sql.Row]
    src.collect().foreach { r =>
      if (!r.isNullAt(1)) {
        val raw = r.getSeq[Double](1).toArray
        var acc = 0.0
        var i = 0
        while (i < raw.length) { acc += raw(i) * raw(i); i += 1 }
        val nrm = math.sqrt(acc)
        val qv = if (nrm > 0) raw.map(_ / nrm) else raw
        val d2 = model.coarseCenters.zipWithIndex.map { case (ctr, cid) =>
          var a = 0.0
          var d = 0
          while (d < qv.length) { val t = qv(d) - ctr(d); a += t * t; d += 1 }
          (a, cid)
        }
        val probes = d2.sortBy(identity).take(nProbe).map(_._2)
        val lut = new Array[Double](model.m * model.k)
        var j = 0
        while (j < model.m) {
          var c = 0
          while (c < model.k) {
            val cb = model.codebooks(j)(c)
            var a = 0.0
            var d = 0
            while (d < model.subDim) {
              a += qv(j * model.subDim + d) * cb(d); d += 1
            }
            lut(j * model.k + c) = a
            c += 1
          }
          j += 1
        }
        probes.foreach { cell =>
          out.add(org.apache.spark.sql.Row(r.get(0), lut.toSeq, cell))
        }
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id", idType),
      org.apache.spark.sql.types.StructField("lut",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false)),
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType)))
    spark.createDataFrame(out, schema)
  }

  /** ADC scoring of an encoded slice against probed queries: equi-join
    * on cell, then each candidate is m LUT lookups summed. */
  private def adcScore(encoded: DataFrame, q: DataFrame,
      model: Model): DataFrame = {
    val kk = model.k
    val adc = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(model.m - 1)),
        (c, j) => element_at(col("lut"), j * kk + c + 1)),
      lit(0.0), (acc, x) => acc + x)
    encoded.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id").as("neighbor_id"),
        adc.as("sim"))
  }

  /** ANN top-k by asymmetric distance only — candidates are scored from
    * their codes and the query LUT; raw vectors are never read. */
  def topK(queries: DataFrame, idCol: String, vecCol: String,
      index: Index, k: Int, nProbe: Int): DataFrame = {
    val q = probesWithLut(queries, idCol, vecCol, index.model, nProbe)
    Similarity.rankTopK(adcScore(index.encoded, q, index.model), k)
  }

  /** ADC shortlist + exact cosine re-rank: take the top `k·rerankFactor`
    * by asymmetric distance, then join the raw corpus BY ID for just
    * those candidates and rank the exact scores. Reads raw vectors for
    * the shortlist only — the standard recall-restoring step that keeps
    * the full-corpus pass on 8-byte codes. */
  def topKRerank(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String,
      index: Index, k: Int, nProbe: Int, rerankFactor: Int = 4): DataFrame = {
    val shortlist = topK(queries, idCol, vecCol, index, k * rerankFactor, nProbe)
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val exact = shortlist
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("cv")).as("sim"))
    Similarity.rankTopK(exact, k)
  }

  // ------------------------------------------------------- persistence
  //
  // A session-built Index dies with the JVM and its cache; at 100 TB the
  // encode pass is far too expensive to repeat per session. save/load
  // make the index a LAKE TABLE, same design as the BM25 inverted index
  // (graft.text.InvertedIndex): the code table commits range-clustered
  // by cell with per-file cell Bloom filters, and the driver-sized model
  // rides the commit as props — one atomic, versioned, vacuumable unit.
  // Serving then reads ONLY the probed cells' files: the IVF promise
  // ("touch nProbe/nList of the corpus") finally reaches the I/O layer
  // instead of stopping at the join.

  /** Exact decimal round-trip: Double.toString is shortest-exact in
    * Java, so parse(toString(x)) == x bit for bit — the model literals a
    * loading session builds are identical to the saver's. */
  private[sim] def renderMatrix(m: Seq[Array[Double]]): String =
    m.map(_.map(_.toString).mkString(",")).mkString(";")
  private[sim] def parseMatrix(s: String): IndexedSeq[Array[Double]] =
    s.split(';').iterator.map(_.split(',').map(_.toDouble)).toIndexedSeq

  /** Persist `index` as a commit-logged table at `dir` (fresh
    * directory): rows (nn_id, cell, codes) range-clustered by cell so a
    * cell's codes live in few files, per-file Bloom filters on cell for
    * probe pruning, model + shape in the table props. */
  def save(spark: org.apache.spark.sql.SparkSession, index: Index,
      dir: String, numFiles: Int = 8): Unit = {
    import graft.sources.CommitLog
    index.encoded
      .repartitionByRange(numFiles, col("cell"))
      .sortWithinPartitions("cell", "nn_id")
      .write.parquet(dir)
    // cell Blooms prune serving probes; nn_id Blooms prune [[update]]'s
    // old-row delete — both ride the same manifest. Model + shape commit
    // WITH the init (one crash-atomic step, the InvertedIndex.build
    // discipline). The shared filter size must fit the LARGER column's
    // per-file cardinality: distinct nn_ids per file ≈ rows/numFiles
    // (distinct cells per file is ≤ that), so sizing to the per-file ROW
    // bound keeps the nn_id filter honest at any corpus size — sized to
    // nList it would saturate and update's pruning would silently become
    // a full index scan. encoded is cached; the count is cheap.
    val perFile = index.encoded.count() / math.max(1, numFiles) + 1L
    CommitLog.init(spark, dir, bloomCols = Seq("cell", "nn_id"),
      bloomExpect = math.max(16L, perFile),
      props = Map(
        "pq.m" -> index.model.m.toString,
        "pq.k" -> index.model.k.toString,
        "pq.subdim" -> index.model.subDim.toString,
        "pq.coarse" -> renderMatrix(index.model.coarseCenters),
        "pq.codebooks" ->
          index.model.codebooks.map(renderMatrix).mkString("|")))
    ()
  }

  /** Incremental maintenance of a persisted index: re-encode ONLY
    * `changedVectors` (each row the NEW vector of an added or edited id;
    * a NULL vector removes the id) under the FROZEN persisted model and
    * swap the touched ids' code rows in one atomic commit — the vector
    * twin of [[graft.text.InvertedIndex.update]].
    *
    * Freezing the quantizer is the standard IVF contract (FAISS `add`
    * after `train`): new vectors are assigned to existing cells and
    * codebooks, so updated codes are bit-identical to what a full
    * re-encode under the same model would produce (PqPersistSpec pins
    * it); quantizer DRIFT — the data distribution outgrowing the
    * centroids — is a periodic re-[[build]], not a per-batch concern.
    *
    * Cost is churn-bounded: changed vectors encode (their size), old
    * rows are found through the committed per-file nn_id Blooms, new
    * rows land cell-sorted. Same stale-snapshot CAS as the inverted
    * index: a commit landing between our read and ours aborts loudly.
    * Cell clustering degrades as updates land in arrival order;
    * [[graft.sources.CommitLog.compactClustered]] on `cell` restores
    * it. */
  def update(spark: org.apache.spark.sql.SparkSession, dir: String,
      changedVectors: DataFrame, idCol: String, vecCol: String): Unit = {
    import graft.sources.CommitLog
    val snap = CommitLog.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir holds no index commit log"))
    val model = modelOf(snap.props, dir) // ONE snapshot read per batch
    val changed = changedVectors
      .select(col(idCol).as("nn_id"), col(vecCol))
      .filter(col("nn_id").isNotNull)
    val touched: Seq[Any] = changed.select(col("nn_id")).distinct()
      .collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return
    val newRows = encodeFeats(
      featize(changed.filter(col(vecCol).isNotNull), "nn_id", vecCol), model)
      .coalesce(1).sortWithinPartitions("cell", "nn_id")
    CommitLog.replaceWhere(spark, dir, col("nn_id").isin(touched: _*),
      newRows,
      probe = Some(("nn_id", touched)),
      expectedVersion = Some(snap.version))
    ()
  }

  private def modelOf(p: Map[String, String], dir: String): Model = {
    require(p.contains("pq.coarse"), s"$dir carries no pq model props")
    Model(parseMatrix(p("pq.coarse")),
      p("pq.codebooks").split('|').iterator.map(parseMatrix).toIndexedSeq,
      p("pq.m").toInt, p("pq.k").toInt, p("pq.subdim").toInt)
  }

  /** The persisted model — kilobytes of props, no data files opened. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): Model =
    modelOf(graft.sources.CommitLog.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir holds no index commit log"))
      .props, dir)

  /** ADC top-k served from a PERSISTED index: the query batch's probed
    * cells are computed driver-side (the batch is small by definition;
    * centroids are already driver-resident), and the code table is read
    * through the committed cell Blooms — only the probed cells' files
    * open, at any index size. Scores are identical to [[topK]] over the
    * same index contents: the Bloom prune keeps every row of every
    * probed cell, and the model literals round-trip exactly. */
  def topKPersisted(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    import graft.sources.CommitLog
    val model = loadModel(spark, dir)
    val q = probesWithLut(queries, idCol, vecCol, model, nProbe)
    val cells: Seq[Any] = q.select(col("cell")).distinct()
      .collect().map(_.getInt(0): Any).toSeq
    val encoded =
      if (cells.isEmpty) CommitLog.read(spark, dir).limit(0)
      else CommitLog.scanPointsIn(spark, dir, "cell", cells)._1
    Similarity.rankTopK(adcScore(encoded, q, model), k)
  }

  /** [[topKRerank]] from a persisted index: Bloom-pruned ADC shortlist,
    * then the exact re-rank re-reads raw vectors for survivors only —
    * ONE lazy plan: the shortlist joins the corpus scan directly
    * (Spark broadcasts the small side). A collect-ids-then-isin
    * pushdown variant was measured SLOWER at the bench scale (the
    * extra driver barrier serializes two jobs and costs more than the
    * corpus scan it saves — ~1.1 s vs ~0.85 s at sf0.1); at a corpus
    * size where one scan dominates, route the re-read through
    * [[graft.sources.CommitLog.scanPointsIn]] on an id-clustered lake
    * instead of a raw parquet corpus. */
  def topKRerankPersisted(spark: org.apache.spark.sql.SparkSession,
      dir: String, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String,
      k: Int, nProbe: Int, rerankFactor: Int = 4): DataFrame = {
    val shortlist =
      topKPersisted(spark, dir, queries, idCol, vecCol, k * rerankFactor, nProbe)
        .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val exact = shortlist
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("cv")).as("sim"))
    Similarity.rankTopK(exact, k)
  }
}

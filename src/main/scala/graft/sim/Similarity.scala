package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>):
  *
  *  - cosine / dot as pure Catalyst expressions (zip_with + aggregate);
  *  - brute-force top-k as the exactness baseline (query-side broadcast ×
  *    corpus scan — linear in corpus size, parallel over partitions);
  *  - random-hyperplane LSH bucketing as the 100 TB path: each vector gets
  *    a small integer bucket; candidate generation becomes an equi-join on
  *    bucket (shuffle on an int key instead of an all-pairs cross join),
  *    re-ranked by exact cosine within buckets.
  */
object Similarity {

  /** Elementwise dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Reference cosine built purely from higher-order functions — kept as
    * the semantic spec for the native expression (NativeVectorSpec pins
    * bit-equality); interpreted, so not the hot-path implementation. */
  def cosinePure(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(0.0)
  }

  /** Cosine similarity; null-safe zero when either norm is 0. Native
    * codegen'd single-pass expression (the hot loop of every similarity
    * operator here). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.NativeVector.cosine(a, b)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Rank a (query_id, neighbor_id, sim) score table to per-query top-k
    * with the (sim DESC, neighbor_id ASC) total order. Integral neighbor
    * ids take the bounded-heap aggregate (shuffles ≤ k rows per (query,
    * partition) — see [[graft.functions.NativeTopK]]); other id types
    * fall back to the window idiom, which the heap's long-keyed state
    * cannot carry. */
  private[sim] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    scored.schema("neighbor_id").dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        graft.functions.NativeTopK.topKPerGroup(
          scored, Seq("query_id"), col("sim"), col("neighbor_id"), k,
          sortName = "sim", idName = "neighbor_id")
          .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
      case _ =>
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("neighbor_id").asc)
        scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
          .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
    }
  }

  /** Exact top-k neighbors for each query row: broadcast the (small) query
    * set against the corpus, rank by cosine. Output: (query_id, neighbor_id,
    * rank, sim). Ties broken by neighbor id for determinism. Self-matches
    * excluded when ids collide. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
    rankTopK(scored, k)
  }

  /** Deterministic random hyperplanes: `planes` sign vectors of length
    * `dim` derived from a seeded PRNG (±1 components — sign-random
    * projection). */
  private[sim] def planeSigns(planes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Random-hyperplane LSH bucket id (0 until 2^planes) for a vector:
    * bit p = sign(v · plane_p). Vectors with equal buckets are likely
    * cosine-close; used as the ANN candidate key. */
  def lshBucket(vec: Column, planes: Int, dim: Int, seed: Long = 7L): Column = {
    val v = asDouble(vec)
    val bits = planeSigns(planes, dim, seed).zipWithIndex.map { case (signs, p) =>
      val proj = dot(v, typedLit(signs))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k: bucket both sides with the same hyperplanes, equi-join
    * on bucket, exact-cosine re-rank within candidates. `tables`
    * independent hash tables (distinct plane seeds) union their
    * candidate pairs — the standard LSH recall lever: a true neighbor
    * is missed only when EVERY table separates the pair, so recall
    * ≈ 1 − (1 − p)^tables for per-table collision probability p,
    * while cost stays candidates-bounded (each table's join is
    * bucket-pruned; never all-pairs). Raise recall with more tables
    * (linear cost) or fewer planes (bigger buckets).
    *
    * Defaults (5 planes × 4 tables) are a measured ≈0.2–0.48
    * recall@10 operating point on the test embedding corpora (0.34 at
    * sf0.1; sparser corpora want more tables) — multi-table by
    * default, because single-table hyperplane LSH at high plane counts
    * is a recall footgun (≈0.1 observed). For large corpora grow
    * `planes` with log₂(N/targetBucketSize) and `tables` with the
    * recall target; for a standing corpus prefer the persisted IVF /
    * IVFPQ index ([[IvfIndex]], [[PqIndex]]), which holds a higher
    * recall-per-cost point than per-query LSH. */
  /** With `index = Some(dir)` the call ROUTES to a persisted IVF index
    * ([[IvfIndex.save]]) instead of per-query LSH: the index holds a
    * strictly better recall-per-cost point (measured ≈0.7 vs ≈0.45
    * recall@10 at comparable serving cost on the test corpora), reads
    * only the probed cells' files through the committed Bloom filters,
    * and amortizes its one-time cluster+assign pass across every query
    * — the right default whenever the corpus stands still long enough
    * to index. `corpus` is ignored on the routed path (the index IS
    * the corpus at its build time). */
  def annTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planes: Int = 5, dim: Int = 64, seed: Long = 7L,
      tables: Int = 4,
      index: Option[String] = None, nProbe: Int = 3): DataFrame = {
    index.foreach { dir =>
      return IvfIndex.topKPersisted(queries.sparkSession, dir, queries,
        idCol, vecCol, k, nProbe)
    }
    require(tables >= 1, "annTopK needs at least one hash table")
    val scored = (0 until tables).map { t =>
      val ts = seed + 7919L * t // distinct plane family per table
      val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"),
        lshBucket(col(vecCol), planes, dim, ts).as("bucket"))
      val c = corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"),
        lshBucket(col(vecCol), planes, dim, ts).as("bucket"))
      c.join(q, Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine(col("qv"), col("cv")).as("sim"))
    }.reduce(_ unionByName _)
      // a pair found by several tables scores identically — keep one
      .dropDuplicates("query_id", "neighbor_id")
    rankTopK(scored, k)
  }

  /** Per-label centroid vectors (prototype embeddings): posexplode to
    * (label, dim, value), one hash aggregation, reassemble in dim order.
    * Sums run in DECIMAL so the result is exact and order-independent —
    * safe to compare across engines and across partitionings (double
    * partial sums would drift with the shuffle layout). One shuffle on
    * (label, dim); at 100 TB the partial aggregation reduces each
    * partition to |labels|·dim rows before it moves.
    */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"),
      posexplode(asDouble(col(vecCol))).as(Seq("pos", "e")))
      .groupBy(col("label"), (col("pos") + 1).as("dim"))
      .agg((sum(col("e").cast("decimal(20,10)")).cast("double")
        / count(lit(1))).cast("double").as("avg_raw"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("avg_raw")))),
        s => s.getField("avg_raw")).as("centroid"))

  /** Per-dimension z-score standardization of an embedding table,
    * flattened to (id, dim, z): z = (x − μ_dim)/σ_dim (population σ) —
    * the feature-scaling step before distance-based indexing when
    * dimensions carry different magnitudes. Moments come from
    * DECIMAL power sums (order-independent under any partitioning);
    * the per-dim stats table is |dims| rows, broadcast back into the
    * flattened scan, so the only full-data shuffle is the partial+final
    * moment aggregation. Constant dimensions (σ = 0) yield NULL z on
    * both engines — guarded explicitly, since ANSI Spark raises on
    * division by zero.
    */
  def standardizeDims(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val e = df.select(col(idCol), posexplode(asDouble(col(vecCol)))
      .as(Seq("pos", "x")))
      .select(col(idCol), (col("pos") + 1).as("dim"), col("x"))
    val st = e.groupBy(col("dim")).agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(20,10)")).cast("double").as("sx"),
      sum((col("x") * col("x")).cast("decimal(24,12)")).cast("double")
        .as("sxx"))
    val mean = col("sx") / col("n")
    val variance = col("sxx") / col("n") - mean * mean
    e.join(broadcast(st), "dim")
      .select(col(idCol), col("dim"),
        when(variance > 0,
          round((col("x") - mean) / sqrt(variance), 6)).as("z6"))
  }

  /** Absmax int8 quantization of an embedding table, flattened to
    * (id, dim, q8): q8 = round(127·e / max|e| over the vector), the
    * storage-compression scheme of int8 inference kernels. Per-vector
    * max(|e|) is order-independent (unlike a sum), so the result is
    * bit-stable under any partitioning and safe to oracle-check.
    * max|e| is an array expression computed BEFORE the explode — the
    * whole operator is a zero-shuffle projection over the scan (a window
    * max over the exploded rows would exchange+sort the flattened
    * table); zero-vectors quantize to 0. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .withColumn("__maxabs", array_max(transform(col("__v"), x => abs(x))))
      .select(col(idCol), col("__maxabs"),
        posexplode(col("__v")).as(Seq("pos", "e")))
      .select(col(idCol), (col("pos") + 1).as("dim"),
        when(col("__maxabs") > 0,
          round(lit(127.0) * col("e") / col("__maxabs")).cast("int"))
          .otherwise(0).as("q8"))

  /** Exact embedding-cosine near-duplicate pairs over a (small) probe
    * set: all id_a < id_b pairs with round(cosine, 6) ≥ threshold —
    * broadcast self-join, O(n²) by design. The oracle-checkable
    * exactness baseline for [[nearDupPairsEmbedding]], which scales the
    * same semantics through LSH buckets. Thresholding on the ROUNDED
    * similarity keeps the pair set identical across engines whose fold
    * order differs in the last ulp. */
  def exactNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val l = df.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("v_a"))
    val r = df.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("v_b"))
    l.join(broadcast(r), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 6).as("sim6"))
      .filter(col("sim6") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold)
    * via LSH buckets — the embedding-space member of the dedup family. */
  def nearDupPairsEmbedding(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 8, dim: Int = 64, seed: Long = 7L): DataFrame = {
    val b = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
      lshBucket(col(vecCol), planes, dim, seed).as("bucket"))
    val l = b.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = b.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("sim"))
      .distinct()
      .filter(col("sim") >= threshold)
  }
}

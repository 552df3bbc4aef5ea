package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines — exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard — built entirely from
  * Catalyst expressions and relational ops (shuffle-aware by design):
  *
  *  - exact dedup is a hash-groupBy on a normalized fingerprint — one
  *    shuffle on a 8-byte key, no text movement;
  *  - MinHash LSH materializes b bucket keys per doc and self-joins on the
  *    bucket — candidate generation is an equi-join (shuffle on bucket
  *    hash), never an O(n²) cross join, which is the only shape that
  *    survives 100 TB;
  *  - SimHash gives a 64-bit signature whose hamming distance bounds
  *    cosine-of-token-sets; pairs come from banding the signature the same
  *    LSH way.
  */
object Dedup {

  // ------------------------------------------------------------ exact
  /** One row per distinct normalized content: keeper id (min), copy count.
    * (A2's drop_duplicates, upgraded with a content key.) */
  def exactDups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.contentFingerprint(col(textCol)).as("content_key"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Drop all but the minimum-id row per distinct content. */
  def dropExactDups(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = exactDups(df, idCol, textCol)
      .select(col("keeper_id").as(idCol))
    df.join(keepers, Seq(idCol), "left_semi")
  }

  // --------------------------------------------------------- shingles
  /** Word n-gram shingles (distinct) of a text column. Short texts
    * (< n tokens) yield one whole-text shingle so they still participate. */
  def shingles(c: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(lower(c))
    val count = size(toks)
    val grams = transform(
      sequence(lit(1), count - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    array_distinct(when(count >= n, grams).otherwise(array(concat_ws(" ", toks))))
  }

  /** Jaccard similarity of two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) > 0,
      size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))
      .otherwise(0.0)

  // ---------------------------------------------------------- minhash
  /** k-wide MinHash signature over word-shingle hashes, as an
    * array<bigint> column. Pure expressions: shingle → per-function
    * xxhash64(shingle-hash, fn-index) rehash → array_min. (Seeded rehash
    * instead of affine remix: ANSI mode forbids wrapping long multiply.) */
  def minhashSignature(c: Column, n: Int = 3, k: Int = 64): Column = {
    val hashes = transform(shingles(c, n), s => xxhash64(s))
    val sig = (0 until k).map { i =>
      array_min(transform(hashes, h => xxhash64(h, lit(i))))
    }
    array(sig: _*)
  }

  /** LSH band keys: the signature split into `bands` groups of `rowsPer`
    * values, each group hashed to one bucket id. Docs sharing ANY band
    * bucket become candidates. */
  def bandKeys(sig: Column, bands: Int, rowsPer: Int): Column =
    array((0 until bands).map { j =>
      val bandVals = (0 until rowsPer).map(r =>
        element_at(sig, j * rowsPer + r + 1).cast("string"))
      xxhash64(lit(j), concat_ws(",", bandVals: _*))
    }: _*)

  /** Near-duplicate candidate pairs via MinHash LSH, verified with true
    * n-gram Jaccard ≥ `threshold`. Returns (id_a, id_b, jaccard) with
    * id_a < id_b, deduplicated across bands.
    *
    * Plan shape: explode bands (b rows/doc) → shuffle on bucket →
    * within-bucket equi-join → distinct pairs → verify. No cross join.
    */
  def nearDupPairsMinhash(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16, threshold: Double = 0.6,
      maxBucketSize: Int = 0): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rowsPer = k / bands
    // Signature via the native single-pass expression (bit-identical to
    // the pure-expression minhashSignature; see NativeHashes + its spec).
    // The candidate join moves ONLY (id, bucket) rows — 16 bytes each —
    // never the shingle arrays: carrying shingles through the band
    // explode would duplicate every doc's array |bands|× into the
    // shuffle. Verification shingles (xxhash64 longs — same Jaccard
    // modulo ~2^-64 collisions) are joined back onto the DISTINCT pair
    // set afterwards, which also computes Jaccard once per pair instead
    // of once per shared bucket.
    // two-step projection on purpose: bandKeys expands to 16 expressions
    // over `sig` — inlining the signature there would re-evaluate the
    // native MinHash once per band
    val sigs = df.select(col(idCol).as("id"),
      graft.functions.NativeHashes.minhashSig(col(textCol), n, k).as("sig"))
    val allBuckets = sigs.select(col("id"),
      explode(bandKeys(col("sig"), bands, rowsPer)).as("bucket"))
    // Production guard for pathological corpora (near-constant band values
    // → one mega-bucket → quadratic candidate join): drop buckets larger
    // than maxBucketSize (0 = unlimited). Costs recall only on documents
    // that are near-dups of > maxBucketSize others.
    val buckets =
      if (maxBucketSize <= 0) allBuckets
      else {
        val ok = allBuckets.groupBy(col("bucket"))
          .agg(count(lit(1)).as("__bc"))
          .filter(col("__bc") <= maxBucketSize)
          .select(col("bucket"))
        allBuckets.join(ok, Seq("bucket"), "left_semi")
      }
    // candidate pairs are tiny relative to the corpus — materialize them
    // (localCheckpoint, same pattern as connectedComponents) so the three
    // consumers below don't re-run the bucket join, then hash shingles
    // ONLY for documents that appear in some pair (semi-join pushdown)
    val pairs = buckets.select(col("bucket"), col("id").as("id_a"))
      .join(buckets.select(col("bucket"), col("id").as("id_b")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
      .localCheckpoint(eager = false)
    val cand = pairs.select(col("id_a").as(idCol))
      .union(pairs.select(col("id_b").as(idCol)))
      .distinct()
    // materialized too: it feeds one join per pair side, and without the
    // checkpoint the semi-joined scan + shingle hashing would run twice
    val sh = df.join(cand, Seq(idCol), "left_semi")
      .select(col(idCol).as("__sid"),
        graft.functions.NativeHashes.shingleHashes(col(textCol), n).as("__sh"))
      .localCheckpoint(eager = false)
    pairs
      .join(sh.select(col("__sid").as("id_a"), col("__sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("__sid").as("id_b"), col("__sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exhaustive n-gram Jaccard pairs (the small-data oracle for LSH): all
    * id_a < id_b pairs with Jaccard ≥ threshold. O(n²) — test/verify use
    * only; the scale path is nearDupPairsMinhash. */
  def nearDupPairsBruteForce(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.6): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      graft.functions.NativeHashes.shingleHashes(col(textCol), n).as("sh"))
    val l = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val r = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact token-set Jaccard for every id_a < id_b pair of a (small) probe
    * set: set-intersection over set-union of distinct lowercase tokens —
    * no hashing anywhere, so it is engine-portable and oracle-checkable
    * (unlike the shingle-hash [[jaccard]]). Broadcast one side; pairwise,
    * so reserve it for probe sets / within-bucket verification — corpus
    * scale goes through [[nearDupPairsMinhash]]. */
  def tokenJaccardPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = array_distinct(graft.text.TextAnalysis.tokens(lower(col(textCol))))
    val l = df.select(col(idCol).as("id_a"), toks.as("t_a"))
    val r = df.select(col(idCol).as("id_b"), toks.as("t_b"))
    l.join(broadcast(r), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("t_a"), col("t_b")).as("jaccard"))
  }

  /** Prefix-filtered exact Jaccard pairs (PPJoin-style): the SCALE path
    * for threshold set-similarity joins, returning EXACTLY the pairs the
    * brute-force [[tokenJaccardPairs]] + threshold filter would — prefix
    * filtering is lossless, so the DuckDB brute-force oracle checks this
    * end to end.
    *
    * Blocking lemma: under one global token order, two sets with
    * J(A,B) ≥ t share ≥ ⌈t·max(|A|,|B|)⌉ tokens, and any two sets with
    * |A∩B| ≥ α intersect within their (|s|−α+1)-prefixes — so candidate
    * pairs only need to co-occur on ONE prefix token. Tokens are ordered
    * rarest-first (freq asc, token asc — deterministic), which makes
    * prefixes collide as little as possible: stopword-bucket blowup is
    * designed out, the candidate join hashes on rare tokens.
    *
    * Shape: vocabulary ranking is one |vocab| aggregation + one
    * zero-partition-column window over the vocab table (broadcast back);
    * per-doc prefix extraction is one (doc-key) window; candidates are a
    * self-join on prefix token + distinct; verification re-joins the two
    * token arrays and keeps J ≥ t. Brute force compares n²/2 pairs;
    * this compares only prefix-colliding ones.
    */
  def jaccardPairsPrefix(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"bad threshold $threshold")
    // tokenized docs feed the vocab count, the prefix extraction, and
    // BOTH sides of the verification join — checkpoint so the corpus is
    // tokenized once, not four times
    val docs = df.select(col(idCol).as("id"),
      array_distinct(graft.text.TextAnalysis.tokens(lower(col(textCol))))
        .as("toks"))
      .localCheckpoint(eager = false)
    val tok = docs.select(col("id"), size(col("toks")).as("sz"),
      explode(col("toks")).as("term"))
    // global rarest-first total order over the vocabulary
    val rank = tok.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n").asc, col("term").asc)))
      .select(col("term"), col("rnk"))
    // prefix = the |s| − ⌈t·|s|⌉ + 1 rarest tokens of each doc. The
    // ceil runs in DECIMAL: double t·|s| can land just above an integer
    // (0.07·100 = 7.000000000000001) and a one-too-high ceil silently
    // shortens the prefix — breaking the losslessness contract.
    // RoundingMode.DOWN, for two reasons: setScale with no mode THROWS
    // for thresholds like 2.0/3 (17 significant digits), and rounding
    // the threshold down can only LENGTHEN the prefix — lossless stays
    // lossless
    val tDec = lit(BigDecimal.valueOf(threshold)
      .setScale(12, scala.math.BigDecimal.RoundingMode.DOWN))
    val byRarity = Window.partitionBy(col("id")).orderBy(col("rnk"))
    val prefix = tok.join(broadcast(rank), "term")
      .withColumn("pos", row_number().over(byRarity))
      .filter(col("pos") <= col("sz") - ceil(tDec * col("sz")) + 1)
      .select(col("id"), col("term"))
    val cand = prefix.select(col("id").as("id_a"), col("term"))
      .join(prefix.select(col("id").as("id_b"), col("term")), Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(docs.select(col("id").as("id_a"), col("toks").as("t_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("toks").as("t_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccard(col("t_a"), col("t_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Edit-distance (Levenshtein) near-dup pairs over a (small) probe set
    * of short strings — the fuzzy-matching member of the dedup family
    * (catalog names, titles, ids-with-typos). Pairwise over a broadcast
    * side by design; at corpus scale, block first (e.g. on a length
    * band or q-gram bucket) and run this within blocks. */
  def editDistancePairs(
      df: DataFrame, idCol: String, strCol: String, maxDist: Int): DataFrame = {
    val l = df.select(col(idCol).as("id_a"), col(strCol).as("s_a"))
    val r = df.select(col(idCol).as("id_b"), col(strCol).as("s_b"))
    l.join(broadcast(r), col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
  }

  // ----------------------------------------------------------- simhash
  /** 64-bit SimHash over word 2-gram shingles: per shingle, xxhash64 votes
    * ±1 on each bit position; sign of the vote sum sets the bit. Shingles
    * (not unigrams) keep signatures distinctive on corpora with heavy
    * vocabulary overlap — with unigram features, any two documents drawing
    * from the same small vocabulary near-collide and the candidate join
    * degenerates toward O(n²). */
  def simhash64(c: Column, n: Int = 2): Column = {
    val toks = shingles(c, n)
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(
        acc,
        transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftrightunsigned", xxhash64(t), i)
            .bitwiseAND(1) === 1, 1).otherwise(-1)),
        (x, y) => x + y))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two simhash columns. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ------------------------------------------- cluster resolution (CC)
  /** Connected components over an undirected edge list — the step that
    * turns near-dup PAIRS into per-document keep/drop decisions (a pair
    * list alone over-drops when dups chain: a~b, b~c must keep exactly one
    * of {a,b,c}, not two keepers).
    *
    * Alternating large-star / small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14): converges in
    * O(log² n) rounds independent of graph diameter, each round two
    * shuffles on node id — the only CC formulation that survives 100 TB
    * corpora where label propagation would need diameter rounds. Each
    * round is pure groupBy/join (no collect_set of neighbor lists, so a
    * celebrity node with 10M neighbors never materializes one giant row).
    *
    * Input: DataFrame with two numeric columns `(u, v)` (any name, taken
    * positionally), self-loops/duplicates tolerated. Output:
    * `(id bigint, component bigint)` — component = min node id reachable.
    * Isolated nodes don't appear in an edge list; callers union them in
    * (see [[resolveClusters]]).
    */
  def connectedComponents(
      edges: DataFrame, maxIter: Int = 50,
      smallGraphCutoff: Long = 1L << 20): DataFrame = {
    val spark = edges.sparkSession
    // canonical directed form: (hi → lo), dropping self-loops
    var e = edges.toDF("u", "v")
      .select(greatest(col("u"), col("v")).cast("long").as("u"),
        least(col("u"), col("v")).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    // Adaptive execution: once the DEDUPED edge list fits on the driver
    // (16 bytes/edge; the cutoff is ~16 MB), path-compressed union-find
    // beats any number of distributed rounds — each star round costs
    // several full stage launches regardless of data size. The iterative
    // path below is the ≥cutoff scale story; this is the same small-side
    // adaptivity as a broadcast join.
    if (e.count() <= smallGraphCutoff) {
      import spark.implicits._
      val pairs = e.as[(Long, Long)].collect()
      graft.runtime.Lifetime.release(e) // collected; the checkpoint is dead
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val ids = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toArray.distinct
      return ids.map(i => (i, find(i))).toSeq.toDF("id", "component")
    }
    var converged = false
    var iter = 0
    // convergence detector: one aggregation job per round — (count,
    // order-independent xor-fold hash) of the edge set. Two distinct edge
    // sets colliding on both is a ~2⁻⁶⁴ event; the alternative (`except`)
    // costs a full extra join per round, which dominates the loop's
    // runtime. bit_xor (not sum) because ANSI mode forbids wrapping adds.
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = signature(e)
    while (!converged && iter < maxIter) {
      // large-star: connect every neighbor v > u to m = min(N(u) ∪ {u}).
      val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = bidir.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = bidir.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star: for each u (over edges u > v), connect all small
      // neighbors and u itself to m = min neighbor.
      val smins = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val joined = large.join(smins, "u")
      val next = joined.select(col("v").as("u"), col("m").as("v"))
        .union(joined.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        // truncate lineage each round — without this the plan doubles per
        // iteration and the driver OOMs on plan size long before the data
        // is large (same reason GraphX checkpoints Pregel iterations)
        .localCheckpoint(true)
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      // next is materialized — the prior round's checkpoint is dead;
      // in-flight block-manager state stays at one round regardless of
      // how many rounds convergence takes (graft.runtime.Lifetime)
      graft.runtime.Lifetime.release(e)
      e = next
      iter += 1
    }
    // loud failure beats silently-wrong components: a non-converged e is
    // NOT a star forest, and interpreting it as one would split real
    // clusters (dedup would then keep duplicates with no signal)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge after $maxIter rounds — " +
        "raise maxIter (O(log² n) rounds suffice for any graph)")
    // e is now a star forest: u → component root (min id)
    val roots = e.select(col("v")).distinct().select(col("v").as("id"), col("v").as("component"))
    e.select(col("u").as("id"), col("v").as("component")).union(roots)
  }

  /** Resolve near-dup pairs into clusters over the full corpus: every id
    * gets a `cluster_id` (= min doc id of its connected near-dup cluster,
    * by the id column's own ordering; singletons are their own cluster)
    * and a `is_keeper` flag (true for exactly one row per cluster).
    * `dropNearDups` = filter(is_keeper).
    *
    * Works for ANY id type. INTEGRAL ids feed [[connectedComponents]]
    * directly and `cluster_id` is bigint; every other type — strings,
    * but also fractional numerics, whose cast-to-long would merge
    * distinct ids like 7.2 and 7.9 into one node — is mapped to
    * xxhash64 surrogate nodes for the CC rounds (collision odds ~2⁻⁶⁴
    * per pair) and `cluster_id` keeps the id
    * column's own type — the min original id per component, recovered
    * with one extra groupBy+join on the component key. */
  def resolveClusters(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idc = col(idCol)
    val integral = df.schema(idCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (integral) {
      val cc = connectedComponents(pairs.select(col("id_a"), col("id_b")))
        .withColumnsRenamed(Map("id" -> idCol, "component" -> "cluster_id"))
      df.join(cc, Seq(idCol), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), idc.cast("long")))
        .withColumn("is_keeper", idc.cast("long") === col("cluster_id"))
    } else {
      val cc = connectedComponents(
        pairs.select(xxhash64(col("id_a")), xxhash64(col("id_b"))))
        .withColumnsRenamed(Map("id" -> "__graft_node", "component" -> "__graft_comp"))
      val joined = df.withColumn("__graft_node", xxhash64(idc))
        .join(cc, Seq("__graft_node"), "left")
        .withColumn("__graft_comp", coalesce(col("__graft_comp"), col("__graft_node")))
      val reps = joined.groupBy(col("__graft_comp")).agg(min(idc).as("cluster_id"))
      joined.join(reps, Seq("__graft_comp"))
        .withColumn("is_keeper", idc === col("cluster_id"))
        .drop("__graft_node", "__graft_comp")
    }
  }

  /** End-to-end near-dup removal: MinHash-LSH pairs → connected
    * components → keep the min-id document per cluster. */
  def dropNearDups(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16, threshold: Double = 0.6): DataFrame = {
    val pairs = nearDupPairsMinhash(df, idCol, textCol, n, k, bands, threshold)
    resolveClusters(df, idCol, pairs).filter(col("is_keeper"))
      .drop("cluster_id", "is_keeper")
  }

  /** SimHash near-dup pairs: band the 64-bit signature into 4×16-bit
    * chunks (any equal chunk → candidate; guarantees recall for hamming
    * ≤ 3), verify by hamming ≤ maxHamming. */
  def nearDupPairsSimhash(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      graft.functions.NativeHashes.simhash64(col(textCol)).as("sig"))
    val chunked = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map(j =>
        concat_ws(":", lit(j).cast("string"), shiftrightunsigned(col("sig"), j * 16)
          .bitwiseAND(lit(0xFFFFL)).cast("string"))): _*)).as("chunk"))
    val l = chunked.select(col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}

package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
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
    // signature via the native single-pass expression (bit-identical to
    // the pure-expression minhashSignature; see NativeHashes + its spec).
    // Verification shingles carried as xxhash64 longs, not strings: the
    // bucket join then shuffles 8-byte array elements and Jaccard runs on
    // longs — same value modulo ~2^-64 collisions.
    val withSig = df.select(
      col(idCol).as("id"),
      graft.functions.NativeHashes.shingleHashes(col(textCol), n).as("sh"),
      graft.functions.NativeHashes.minhashSig(col(textCol), n, k).as("sig"))
    val allBuckets = withSig
      .select(col("id"), col("sh"), explode(bandKeys(col("sig"), bands, rowsPer)).as("bucket"))
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
    val l = buckets.select(col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = buckets.select(col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
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

package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analytics.SpeedHistogram
import graft.dedup.Dedup
import graft.ops.{JoinOps, RadarOps}
import graft.sim.Similarity
import graft.text.TextAnalysis

/** User-facing facade: `import graft.api.Graft._` gives DataFrames the
  * engine's operator vocabulary as methods. Thin sugar over the module
  * functions — nothing here adds semantics, so every method stays covered
  * by the underlying modules' specs and oracle queries.
  */
object Graft {

  implicit class TextOps(private val df: DataFrame) {

    /** Append token/quality/language columns for a text column. */
    def withTextStats(textCol: String = "text"): DataFrame = {
      val t = col(textCol)
      df.withColumn("n_tokens", TextAnalysis.tokenCount(t))
        .withColumn("n_bpeish", TextAnalysis.bpeishCount(t))
        .withColumn("quality", TextAnalysis.qualityScore(t))
        .withColumn("lang_pred", TextAnalysis.langId(t))
    }

    /** Drop exact duplicates by normalized content (keeps min id). */
    def dedupExact(idCol: String, textCol: String = "text"): DataFrame =
      Dedup.dropExactDups(df, idCol, textCol)

    /** Near-duplicate pairs via MinHash LSH. */
    def nearDupPairs(idCol: String, textCol: String = "text",
        threshold: Double = 0.6): DataFrame =
      Dedup.nearDupPairsMinhash(df, idCol, textCol, threshold = threshold)

    /** Drop near-duplicates: for every LSH pair above threshold, keep the
      * smaller id. (Greedy, one round — transitive chains keep their
      * minimum element.) */
    def dedupNear(idCol: String, textCol: String = "text",
        threshold: Double = 0.6): DataFrame = {
      val losers = Dedup.nearDupPairsMinhash(df, idCol, textCol, threshold = threshold)
        .select(col("id_b").as(idCol)).distinct()
      df.join(losers, Seq(idCol), "left_anti")
    }
  }

  implicit class VectorOps(private val df: DataFrame) {

    /** Exact cosine top-k neighbors of `queries` within this corpus. */
    def topKNeighbors(queries: DataFrame, idCol: String, vecCol: String,
        k: Int): DataFrame =
      Similarity.bruteForceTopK(queries, df, idCol, vecCol, k)

    /** Approximate top-k via random-hyperplane LSH buckets. */
    def annNeighbors(queries: DataFrame, idCol: String, vecCol: String,
        k: Int, planes: Int = 8, dim: Int = 64): DataFrame =
      Similarity.annTopK(queries, df, idCol, vecCol, k, planes, dim)
  }

  implicit class FlowOps(private val df: DataFrame) {

    /** Mean + p85 speed per (equipment, direction, day). */
    def dailyProfile(): DataFrame = SpeedHistogram.dailyProfile(df)

    /** Deficient dates in [start, end] given an expected file count. */
    def completenessAudit(start: String, end: String, expected: Int): DataFrame =
      RadarOps.completenessAudit(df, lit(start), lit(end), expected)

    /** Backward as-of join (latest right row at-or-before each left row). */
    def asofJoin(right: DataFrame, keys: Seq[String], tsCol: String,
        valueCols: Seq[String]): DataFrame =
      JoinOps.asofJoinBackward(df, right, keys, tsCol, valueCols)
  }

  /** Column-level vocabulary re-exported for expression building. */
  def cosine(a: Column, b: Column): Column = Similarity.cosine(a, b)
  def tokenCount(c: Column): Column = TextAnalysis.tokenCount(c)
  def qualityScore(c: Column): Column = TextAnalysis.qualityScore(c)
  def langId(c: Column): Column = TextAnalysis.langId(c)
  def simhash(c: Column): Column = graft.functions.NativeHashes.simhash64(c)
  def minhashSig(c: Column): Column = graft.functions.NativeHashes.minhashSig(c)
}

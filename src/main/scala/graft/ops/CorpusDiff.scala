package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift report: what changed between two corpus versions (e.g.
  * two [[graft.sources.CommitLog]] snapshots of the published lake) —
  * the quantitative half of a re-publish review:
  *
  *  - exact doc counts and exact mean token lengths per side;
  *  - exact vocabulary delta (tokens added / removed / shared), from a
  *    full-outer join of the two sides' token counts — vocabulary-sized,
  *    never corpus-sized;
  *  - KL divergence D(after ‖ before) of the unigram distributions over
  *    the SHARED vocabulary (the added/removed mass is reported
  *    separately — classic KL is undefined there, and smoothing would
  *    bury the signal the vocab delta already carries).
  *
  * Exactness discipline (same as the moments/trend operators): every
  * per-term KL contribution is an identical IEEE expression on both
  * engines, rounded to 9 decimals and summed as DECIMAL so the total is
  * order-independent — a raw double SUM would hash-differ per partition
  * count. One tokenize pass per side; the join and aggregates run on
  * the vocabulary table.
  */
object CorpusDiff {

  private def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "\\s+"), t => t =!= "")

  private def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))

  /** One-row drift report: n_docs_before/after, mean_len_before/after
    * (doubles, exact int-sum / count), vocab_added/removed/common,
    * kl_divergence (D(after‖before), 6 decimals). */
  def diff(before: DataFrame, after: DataFrame,
      textCol: String = "text"): DataFrame = {
    val b = tokenCounts(before, textCol).withColumnRenamed("cnt", "cb")
    val a = tokenCounts(after, textCol).withColumnRenamed("cnt", "ca")
    val joined = a.join(b, Seq("t"), "full_outer")

    def side(df: DataFrame, n: String, m: String): DataFrame =
      df.agg(count(lit(1)).as(n),
        (sum(coalesce(size(tokens(col(textCol))), lit(0)).cast("long"))
          .cast("double") / count(lit(1)).cast("double")).as(m))
    val docSides = side(before, "n_docs_before", "mean_len_before")
      .crossJoin(side(after, "n_docs_after", "mean_len_after"))

    val totals = joined.agg(
      sum(coalesce(col("ca"), lit(0L))).as("ta"),
      sum(coalesce(col("cb"), lit(0L))).as("tb"))

    // per-term KL contribution — identical IEEE op order on both engines:
    // p = ca/ta, q = cb/tb, term = p * ln(p / q), rounded then DECIMAL-summed.
    // The ln is graft_strict_ln (StrictMath), NOT Spark's log (Math.log):
    // Math.log's interpreter path and C2 intrinsic may differ in the last
    // ulp, and which one computes a row depends on JIT timing — the only
    // operator here whose output was not a pure function of its input.
    // StrictMath is fdlibm-exact on every JVM and JIT state, so this
    // value is bit-stable run to run; the 9-decimal per-term round then
    // makes a residual Spark-vs-DuckDB libm ulp gap flip a term only
    // when the true value sits within ~1e-20 of a rounding boundary.
    val p = col("ca").cast("double") / col("ta").cast("double")
    val q = col("cb").cast("double") / col("tb").cast("double")
    val klTerm = round(p * graft.functions.NativeMath.strictLn(p / q), 9)
      .cast("decimal(28,9)")
    val vocab = joined.crossJoin(broadcast(totals)).agg(
      sum(when(col("cb").isNull, 1L).otherwise(0L)).as("vocab_added"),
      sum(when(col("ca").isNull, 1L).otherwise(0L)).as("vocab_removed"),
      sum(when(col("ca").isNotNull && col("cb").isNotNull, 1L).otherwise(0L))
        .as("vocab_common"),
      round(sum(when(col("ca").isNotNull && col("cb").isNotNull, klTerm)
        .otherwise(lit(null))).cast("double"), 6).as("kl_divergence"))

    docSides.crossJoin(vocab)
      .select(col("n_docs_before"), col("n_docs_after"),
        round(col("mean_len_before"), 6).as("mean_len_before"),
        round(col("mean_len_after"), 6).as("mean_len_after"),
        col("vocab_added"), col("vocab_removed"), col("vocab_common"),
        col("kl_divergence"))
  }
}

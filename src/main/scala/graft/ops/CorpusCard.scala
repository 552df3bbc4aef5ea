package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus datasheet: the one-row profile a training-data team publishes
  * with a corpus (the "datasheets for datasets" card, computed rather
  * than hand-written), assembled from the engine's mergeable-sketch
  * primitives so it stays computable at any corpus size:
  *
  *  - exact row-local counts (docs, empty docs, token totals) fuse into
  *    ONE scan-aggregate alongside the sketches;
  *  - distinct doc ids via a theta sketch (exact below 2^lgK — lgK=20
  *    covers a million ids exactly, estimates beyond, and the sketch
  *    merges if cards from corpus shards are later combined);
  *  - token-length quantiles via KLL (mergeable, bounded rank error);
  *  - dominant tokens via the exact two-pass heavy hitters (Misra-Gries
  *    candidates + exact recount — output exact);
  *  - per-language doc counts as an exact map (languages are
  *    low-cardinality by construction after language ID).
  *
  * Two token passes total (the fused profile scan and the heavy-hitter
  * recount); nothing shuffles the token space. Mirrors the reference's
  * publish-side completeness reporting (`/root/reference/src/
  * verify_dates.py`) lifted to corpus scale.
  */
object CorpusCard {

  private def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "\\s+"), t => t =!= "")

  /** The one-row card. Deterministic columns (everything except the
    * KLL-estimated token-length quantiles, which carry rank-bounded
    * randomness): n_docs, n_distinct_ids (exact below 2^lgK), n_empty,
    * total_tokens, lang_counts, top_tokens (exact counts, ordered).
    * `hhFrac` thresholds the dominant-token list at that fraction of
    * all tokens. */
  def build(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", langCol: String = "lang",
      hhFrac: Double = 0.01, lgK: Int = 20): DataFrame = {
    import graft.functions.NativeSketches._
    val toks = tokens(col(textCol))

    // ONE fused scan: exact row-local counts + both sketches
    val profile = docs.agg(
      count(lit(1)).as("n_docs"),
      thetaAgg(col(idCol), lgK).as("__ids"),
      sum(when(toks.isNull || size(toks) === 0, 1L).otherwise(0L)).as("n_empty"),
      sum(coalesce(size(toks), lit(0)).cast("long")).as("total_tokens"),
      kllAgg(size(toks).cast("double"), 200).as("__lens"))
    val card = profile.select(
      col("n_docs"),
      round(thetaEstimate(col("__ids"))).cast("long").as("n_distinct_ids"),
      col("n_empty"), col("total_tokens"),
      kllQuantiles(col("__lens"), Seq(0.5, 0.95, 0.99)).as("token_len_q"))

    // exact per-language doc counts, folded to a sorted map
    val langs = docs.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("n"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("lang"), col("n")))))
        .as("lang_counts"))

    // exact dominant tokens (two bounded passes; ordered cnt DESC, token)
    val hh = graft.analytics.Sketches.exactHeavyHitters(
      docs.select(explode(toks).as("token")), col("token"), hhFrac)
      .agg(collect_list(struct(col("cnt"), col("item").as("token")))
        .as("__hh"))
      .select(reverse(array_sort(col("__hh"))).as("top_tokens"))

    card.crossJoin(langs).crossJoin(hh)
  }
}

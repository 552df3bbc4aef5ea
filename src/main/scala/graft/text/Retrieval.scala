package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval scoring — the ranking half of the
  * retrieve-and-filter loops an LLM-data pipeline runs (hard-negative
  * mining, dedup-aware retrieval, eval-set contamination probes) when
  * embeddings are too expensive or too blunt.
  *
  * Execution shape for a 100 TB corpus:
  *  - ONE tokenize+aggregate pass computes, per document, its length and
  *    its term frequency for every query term (term list is a literal —
  *    the tf columns are conditional sums, no pivot, no second scan);
  *  - document frequencies and the corpus averages reduce that per-doc
  *    table (already ~|corpus| rows, not |tokens|) to one broadcast row;
  *  - scoring is pure per-row arithmetic, and the final top-k is a
  *    TakeOrderedAndProject — no global sort materializes.
  * The per-term score sum is written as an explicit left-to-right `+`
  * chain and every division/multiplication keeps one fixed sequence, so
  * the doubles are bit-reproducible across engines — q136 hash-matches a
  * DuckDB oracle mirroring the same IEEE op order.
  *
  * Uses the Robertson/Lucene idf form `ln((N − df + 0.5)/(df + 0.5) + 1)`
  * (always ≥ 0, no negative-idf clamp needed).
  */
object Retrieval {

  /** Whitespace tokens of `lower(text)`, empties dropped — the same
    * definition the oracle uses (`string_split_regex(lower(text),'\s+')`). */
  private def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "\\s+"), t => t =!= "")

  /** BM25 scores for `terms` against every document; returns the top `k`
    * as (doc_id-named idCol, score) with score rounded to 6 decimals and
    * ties broken by id. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "terms: non-empty, unique")
    val id = col(idCol)

    // pass 1 (the only corpus-wide pass): per-doc length + per-term tf
    val tok = docs.select(id, explode(tokens(col(textCol))).as("t"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("t") === t, 1L).otherwise(0L)).as(s"tf$i")
    }
    val perDoc = tok.groupBy(id)
      .agg(count(lit(1)).as("len"), tfCols: _*)

    // corpus constants: one row, broadcast back onto the per-doc table
    val dfCols = terms.indices.map { i =>
      sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")
    }
    val gAggs = Seq(
      count(lit(1)).as("n"),
      (sum(col("len")).cast("double") / count(lit(1))).as("avglen")) ++ dfCols
    val globals = perDoc.agg(gAggs.head, gAggs.tail: _*)

    val scored = perDoc.crossJoin(broadcast(globals))
    // idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen)), summed in
    // term order as an explicit + chain (bit-stable, unlike SUM over an
    // unpivoted set whose order the engine chooses)
    val termScores: Seq[Column] = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val dfT = col(s"df$i").cast("double")
      val idf = log((col("n").cast("double") - dfT + 0.5) / (dfT + 0.5) + 1.0)
      // lit(1.0 - b) / lit(k1 + 1.0): folded in Scala; the oracle spells
      // the same arithmetic (`1.0 - 0.75`, `1.2 + 1.0`) so both engines
      // hold bit-identical constants
      val den = tf + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("len").cast("double") / col("avglen"))
      when(col(s"tf$i") > 0, idf * (tf * lit(k1 + 1.0)) / den)
        .otherwise(lit(0.0))
    }
    val score = termScores.reduceLeft(_ + _)
    scored.select(id, round(score, 6).as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, id)
      .limit(k)
  }
}

package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. Everything
  * is a Catalyst Column expression (no UDFs) so it stays inside
  * whole-stage codegen and scales linearly over a 100 TB documents table.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword proxy: word pieces + standalone punctuation — the
    * common pre-tokenizer shape (\w+|[^\w\s]). A real BPE vocab merge is a
    * lookup table, not a regex; this is the standard cheap estimator for
    * token-budget accounting. */
  def bpeishCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Sentence-ish punctuation count over .,;:!? */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,;:!?]", ""))

  def punctRatio(c: Column): Column =
    when(length(c) > 0, punctCount(c).cast("double") / length(c)).otherwise(0.0)

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic
    * language ID. Deliberately small + ASCII; CJK is detected by script. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "para", "en", "que"),
    "pt" -> Seq("o", "a", "os", "e", "é", "um", "uma", "para", "em", "não"))

  /** Count of tokens contained in `words` (lowercased match). */
  def stopwordHits(c: Column, words: Seq[String]): Column =
    size(filter(tokens(lower(c)), t => t.isInCollection(words)))

  def stopwordRatio(c: Column, lang: String = "en"): Column = {
    val n = tokenCount(c)
    when(n > 0, stopwordHits(c, stopwords(lang)).cast("double") / n).otherwise(0.0)
  }

  /** Fraction of CJK characters — the script-based detector for zh. */
  def cjkRatio(c: Column): Column =
    when(length(c) > 0,
      (length(c) - length(regexp_replace(c, "[\\u4e00-\\u9fff]", ""))).cast("double")
        / length(c)).otherwise(0.0)

  /** Heuristic language ID: script check for zh, else argmax of stopword
    * hits across the five latin-script lists ("und" when nothing hits).
    * Native single-pass codegen'd expression — the pure fold below
    * re-tokenizes per (language, comparison) pair in interpreted HOFs;
    * NativeTextSpec pins bit-equality between the two. */
  def langId(c: Column): Column = graft.functions.NativeText.langId(c)

  /** Pure-expression semantic spec for [[langId]] (interpreted — not the
    * hot-path implementation). */
  def langIdPure(c: Column): Column = {
    val hits = stopwords.toSeq.sortBy(_._1)
      .map { case (lang, words) => lang -> stopwordHits(c, words) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = hits.foldLeft(lit("und")) { case (acc, (lang, h)) =>
      when(h === best && h > 0, lang).otherwise(acc)
    }
    when(cjkRatio(c) > 0.25, "zh").otherwise(pick)
  }

  /** Composite quality score in [0,1]: length sweet-spot, moderate
    * punctuation, healthy stopword density, reasonable mean word length.
    * Deterministic double arithmetic (safe to oracle-check). */
  def qualityScore(c: Column): Column = {
    val n = tokenCount(c).cast("double")
    val lengthScore = least(n / 100.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(c) * 10.0, lit(1.0))
    val stopScore = least(stopwordRatio(c) * 4.0, lit(1.0))
    val meanWordLen = when(n > 0, length(regexp_replace(trim(c), "\\s+", "")).cast("double") / n)
      .otherwise(0.0)
    val wordLenScore = when(meanWordLen.between(3.0, 8.0), 1.0).otherwise(0.5)
    (lengthScore * 0.3 + punctScore * 0.2 + stopScore * 0.3 + wordLenScore * 0.2)
  }

  /** Training-corpus text normalization: lowercase, strip URLs, strip
    * email addresses, replace every non-alphanumeric rune with a space,
    * collapse whitespace, trim. The standard pre-dedup/pre-tokenize
    * cleanup pass; pure regexp expressions so the whole pipeline is one
    * codegen'd projection over the scan — zero shuffles at any scale. */
  def normalize(c: Column): Column = {
    val lowered = lower(c)
    val noUrl = regexp_replace(lowered, "https?://\\S+", " ")
    val noEmail = regexp_replace(noUrl, "\\S+@\\S+", " ")
    val alnum = regexp_replace(noEmail, "[^a-z0-9\\s]", " ")
    trim(regexp_replace(alnum, "\\s+", " "))
  }

  /** Exact-content fingerprint: 64-bit hash of whitespace-normalized,
    * lowercased text — the exact-dedup key. */
  def contentFingerprint(c: Column): Column =
    xxhash64(lower(regexp_replace(trim(c), "\\s+", " ")))

  /** Winnowing-style robust fingerprint: minimum hash over character
    * k-gram shingles of the normalized text, sampled every `stride` chars
    * (survives small edits at the ends; SURVEY "document fingerprinting
    * (rolling hash)"). Striding cuts the per-doc substring+hash count 4×
    * with negligible fingerprint quality loss — min-of-hashes only needs
    * enough grams for the minimum to be stable. */
  def winnowFingerprint(c: Column, k: Int = 16, stride: Int = 4): Column = {
    val norm = lower(regexp_replace(trim(c), "\\s+", " "))
    val n = length(norm)
    val gramHashes = transform(
      sequence(lit(1), greatest(n - (k - 1), lit(1)), lit(stride)),
      i => xxhash64(norm.substr(i, lit(k))))
    array_min(gramHashes)
  }
}

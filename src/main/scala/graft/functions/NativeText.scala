package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass language ID.
  *
  * The pure-expression [[graft.text.TextAnalysis.langIdPure]] is the
  * semantic spec, but its expression tree re-tokenizes the document for
  * every (language, comparison) pair — the per-language `filter` HOFs are
  * interpreted (CodegenFallback) and appear once inside `greatest` and
  * once per `when` arm, ~30 interpreted array passes per row. This
  * expression tokenizes once, counts hits against all language lists in
  * one loop, and stays inside whole-stage codegen via a static call —
  * same bit-for-bit result (NativeTextSpec pins equality).
  */
object NativeText {

  /** Sorted language keys — fold precedence: on tied hit counts the
    * LATER language in sorted order wins, matching the pure fold where
    * later `when`s wrap earlier ones. */
  private val langs: Array[String] =
    graft.text.TextAnalysis.stopwords.keys.toArray.sorted

  private val langU8: Array[UTF8String] = langs.map(UTF8String.fromString)
  private val und = UTF8String.fromString("und")
  private val zh = UTF8String.fromString("zh")

  /** token → indices of languages whose stopword list contains it
    * (lists overlap: "a" is both en and pt). */
  private val tokenLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    langs.zipWithIndex.foreach { case (l, i) =>
      graft.text.TextAnalysis.stopwords(l).foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  /** Spark's trim() strips 0x20 only (not \t\n like String.trim). */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** Shared by interpreted eval and generated code. */
  def evalLangId(input: UTF8String): UTF8String = {
    val s = input.toString
    // script check first: fraction of CJK codepoints (BMP block, so a
    // char scan suffices) over total codepoints — cjkRatio > 0.25 → zh
    var cjk = 0
    var ci = 0
    while (ci < s.length) {
      val ch = s.charAt(ci)
      if (ch >= 0x4e00 && ch <= 0x9fff) cjk += 1
      ci += 1
    }
    val nChars = s.codePointCount(0, s.length)
    if (nChars > 0 && cjk.toDouble / nChars > 0.25) return zh
    // lowercase via UTF8String — the SAME code path as Spark's lower(),
    // including its non-ASCII fallback; String.toLowerCase(ROOT) would
    // diverge from the pure fold on locale-sensitive JVMs (tr/az)
    val toks = trimSpaces(input.toLowerCase.toString).split("\\s+", -1)
    val counts = new Array[Int](langs.length)
    var ti = 0
    while (ti < toks.length) {
      val hit = tokenLangs.get(toks(ti))
      if (hit != null) {
        var hi = 0
        while (hi < hit.length) { counts(hit(hi)) += 1; hi += 1 }
      }
      ti += 1
    }
    var best = 0
    var pick = -1
    var li = 0
    while (li < counts.length) {
      // >= : later language wins ties, matching the fold precedence
      if (counts(li) > 0 && counts(li) >= best) { best = counts(li); pick = li }
      li += 1
    }
    if (pick >= 0) langU8(pick) else und
  }

  private val enStop: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.text.TextAnalysis.stopwords("en").foreach(s.add)
    s
  }

  /** Single-pass text statistics, bit-identical to the pure-expression
    * columns of q19 (tokenCount / bpeishCount / punctCount /
    * stopwordRatio / qualityScore), which re-tokenize and re-scan the
    * document once per derived column in interpreted HOFs. One codepoint
    * scan + one tokenize here. Character classes replicate Java regex
    * defaults exactly: \w = [a-zA-Z0-9_], \s = [ \t\n\x0B\f\r]. */
  def evalTextStats(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = input.toString
    var i = 0
    var chars = 0      // codepoints — Spark length()
    var nonSpace = 0   // codepoints surviving regexp_replace(\s+ → "")
    var punct = 0      // [.,;:!?]
    var bpeish = 0     // regexp_extract_all(\w+|[^\w\s]) match count
    var inWord = false
    while (i < s.length) {
      val cp = s.codePointAt(i)
      chars += 1
      val isSpace = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      val isWord = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9') || cp == '_'
      if (!isSpace) nonSpace += 1
      if (cp == '.' || cp == ',' || cp == ';' || cp == ':' || cp == '!' || cp == '?')
        punct += 1
      if (isWord) {
        if (!inWord) { bpeish += 1; inWord = true }
      } else {
        inWord = false
        if (!isSpace) bpeish += 1
      }
      i += Character.charCount(cp)
    }
    // token count is whitespace-structural — identical on the lowered
    // text, so one tokenize serves both the count and the stopword hits
    val toks = trimSpaces(input.toLowerCase.toString).split("\\s+", -1)
    val nInt = toks.length
    var hits = 0
    var ti = 0
    while (ti < toks.length) { if (enStop.contains(toks(ti))) hits += 1; ti += 1 }
    // formulas replicated term-for-term (same op order → same bits)
    val n = nInt.toDouble
    val lengthScore = math.min(n / 100.0, 1.0)
    val punctRatio = if (chars > 0) punct.toDouble / chars else 0.0
    val punctScore = 1.0 - math.min(punctRatio * 10.0, 1.0)
    val stopRatio = if (nInt > 0) hits.toDouble / nInt else 0.0
    val stopScore = math.min(stopRatio * 4.0, 1.0)
    val meanWordLen = if (nInt > 0) nonSpace.toDouble / n else 0.0
    val wordLenScore = if (meanWordLen >= 3.0 && meanWordLen <= 8.0) 1.0 else 0.5
    val quality = lengthScore * 0.3 + punctScore * 0.2 + stopScore * 0.3 +
      wordLenScore * 0.2
    org.apache.spark.sql.catalyst.InternalRow(
      nInt, bpeish, punct, stopRatio, quality)
  }

  val textStatsType: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_bpeish", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))

  /** graft_text_stats(text): struct of the five q19 statistics. */
  case class TextStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = textStatsType
    override def prettyName: String = "graft_text_stats"
    override protected def nullSafeEval(input: Any): Any =
      evalTextStats(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeText.evalTextStats($c);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** lang_id(text): heuristic language code, bit-identical to the pure
    * fold. Null input yields null (the Column builder coalesces to
    * 'und', which is what the pure fold produces for null). */
  case class LangIdExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_langid"
    override protected def nullSafeEval(input: Any): Any =
      evalLangId(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeText.evalLangId($c);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unicode normalization (NFC/NFD/NFKC/NFKD) via java.text.Normalizer —
    * the standard pre-dedup canonicalization step (decomposed accents,
    * compatibility ligatures, full-width forms all hash differently
    * unnormalized). Spark has no built-in for this; a native expression
    * keeps it inside whole-stage codegen.
    */
  def evalNormalize(input: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val s = input.toString
    // fast path: Normalizer.isNormalized is a cheap scan, and real corpora
    // are overwhelmingly already-NFC — skip the allocation when so
    if (java.text.Normalizer.isNormalized(s, form)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, form))
  }

  private val AllowedForms = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Validate a form name at analysis time so a bad call fails with a
    * clear message rather than an execution-time enum error (or an NPE
    * for a null literal). */
  def checkedForm(name: String): String = {
    if (name == null)
      throw new IllegalArgumentException(
        "graft_normalize: form must not be NULL; expected one of NFC, NFD, NFKC, NFKD")
    val up = name.toUpperCase(java.util.Locale.ROOT)
    if (!AllowedForms.contains(up))
      throw new IllegalArgumentException(
        s"graft_normalize: unknown form '$name'; expected one of NFC, NFD, NFKC, NFKD")
    up
  }

  /** SQL-registration helper: second arg must be a string literal form
    * name; absent → NFC. */
  def formNameOf(exprs: Seq[Expression]): String = exprs.drop(1) match {
    case Seq(org.apache.spark.sql.catalyst.expressions.Literal(f: UTF8String, StringType)) =>
      checkedForm(if (f == null) null else f.toString)
    case Seq(org.apache.spark.sql.catalyst.expressions.Literal(null, _)) =>
      checkedForm(null)
    case Seq() => "NFC"
    case other =>
      throw new IllegalArgumentException(
        s"graft_normalize: form must be a string literal, got $other")
  }

  /** graft_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD'). */
  case class NormalizeExpr(child: Expression, formName: String)
      extends UnaryExpression {
    @transient private lazy val form = java.text.Normalizer.Form.valueOf(formName)
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_normalize"
    override protected def nullSafeEval(input: Any): Any =
      evalNormalize(input.asInstanceOf[UTF8String], form)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val formRef = ctx.addReferenceObj("form", form, classOf[java.text.Normalizer.Form].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeText.evalNormalize($c, $formRef);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Unicode-normalize a string column; form ∈ NFC|NFD|NFKC|NFKD
    * (validated eagerly — a bad form fails here, not at execution). */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(NormalizeExpr(ColumnBridge.expression(c), checkedForm(form)))

  /** Column form; null text → 'und' exactly like the pure fold (whose
    * `when` chain bottoms out at the literal). */
  def langId(c: Column): Column =
    org.apache.spark.sql.functions.coalesce(
      ColumnBridge.column(LangIdExpr(ColumnBridge.expression(c))),
      org.apache.spark.sql.functions.lit("und"))

  /** Struct of (n_tokens, n_bpeish, n_punct, stop_ratio, quality). */
  def textStats(c: Column): Column =
    ColumnBridge.column(TextStatsExpr(ColumnBridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
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

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column form; null text → 'und' exactly like the pure fold (whose
    * `when` chain bottoms out at the literal). */
  def langId(c: Column): Column =
    org.apache.spark.sql.functions.coalesce(
      ColumnBridge.column(LangIdExpr(ColumnBridge.expression(c))),
      org.apache.spark.sql.functions.lit("und"))
}

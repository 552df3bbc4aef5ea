package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup signature functions.
  *
  * The pure-`functions._` formulations in [[graft.dedup.Dedup]] are
  * semantically right but build a forest of k×|shingles| array expressions
  * per row — measured 12-18 s over 5k docs at sf0.1. These single-pass
  * implementations (one tokenize, tight long loops, zero intermediate
  * arrays) compute bit-identical signatures ~1-2 orders of magnitude
  * faster; DedupNativeSpec pins the equivalence.
  *
  * Hash chain replicated from Spark's own xxhash64 SQL function
  * (seed 42, XXH64 per element) so `minhash_sig(text)[i] ==
  * array_min(transform(..., h -> xxhash64(h, i)))` exactly.
  */
object NativeHashes {

  private val SEED = 42L

  /** Lowercased whitespace tokens → distinct word n-gram shingles, exactly
    * mirroring Dedup.shingles (split(trim(lower(text)), "\\s+"), n-gram
    * concat_ws(" "), array_distinct, whole-text fallback). */
  /** Spark's trim() strips 0x20 only (not \t\n like String.trim). */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  // lowercase via UTF8String — the SAME path as Spark's lower() incl.
  // its non-ASCII fallback, so bit-equality with the pure expressions
  // holds on locale-sensitive JVMs (tr/az) too
  private[functions] def shingleStrings(text: UTF8String, n: Int): Array[String] = {
    val toks = trimSpaces(text.toLowerCase.toString).split("\\s+", -1)
    if (toks.length >= n) {
      val out = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        out.add(sb.toString)
        i += 1
      }
      out.toArray(new Array[String](out.size))
    } else Array(toks.mkString(" "))
  }

  private def hashShingle(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, SEED)
  }

  /** xxhash64(h: bigint, i: int) with Spark's chained-seed semantics. */
  private def rehash(h: Long, i: Int): Long =
    XXH64.hashInt(i, XXH64.hashLong(h, SEED))

  // -------- public static evaluators (shared by eval + generated code)

  def evalMinhash(input: UTF8String, n: Int, k: Int): GenericArrayData = {
    val shingles = shingleStrings(input, n)
    val mins = Array.fill(k)(Long.MaxValue)
    var si = 0
    while (si < shingles.length) {
      val base = hashShingle(shingles(si))
      val inner = XXH64.hashLong(base, SEED)
      var i = 0
      while (i < k) {
        val h = XXH64.hashInt(i, inner)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      si += 1
    }
    new GenericArrayData(mins)
  }

  def evalShingleHashes(input: UTF8String, n: Int): GenericArrayData = {
    val shingles = shingleStrings(input, n)
    val out = new Array[Long](shingles.length)
    var i = 0
    while (i < shingles.length) { out(i) = hashShingle(shingles(i)); i += 1 }
    new GenericArrayData(out)
  }

  def evalSimhash(input: UTF8String, n: Int): Long = {
    val shingles = shingleStrings(input, n)
    val votes = new Array[Int](64)
    var si = 0
    while (si < shingles.length) {
      val h = hashShingle(shingles(si))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      si += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def evalWinnow(input: UTF8String, k: Int, stride: Int): Long = {
    val norm = trimSpaces(input.toLowerCase.toString)
      .replaceAll("\\s+", " ")
    val u = UTF8String.fromString(norm)
    val n = u.numChars()
    val last = math.max(n - (k - 1), 1)
    var min = Long.MaxValue
    var i = 1
    while (i <= last) {
      val gram = u.substringSQL(i, k)
      val h = XXH64.hashUnsafeBytes(
        gram.getBaseObject, gram.getBaseOffset, gram.numBytes, SEED)
      if (h < min) min = h
      i += stride
    }
    min
  }

  /** minhash_sig(text): array<bigint> of k MinHash values over word
    * n-gram shingles. Generates a direct static call so the expression
    * stays inside whole-stage codegen. */
  case class MinHashSigExpr(child: Expression, n: Int, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_sig"
    override protected def nullSafeEval(input: Any): Any =
      evalMinhash(input.asInstanceOf[UTF8String], n, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeHashes.evalMinhash($c, $n, $k);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** shingle_hashes(text): array<bigint> of xxhash64 values of the distinct
    * word n-gram shingles — bit-identical to
    * transform(Dedup.shingles(c, n), s => xxhash64(s)). */
  case class ShingleHashesExpr(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_shingle_hashes"
    override protected def nullSafeEval(input: Any): Any =
      evalShingleHashes(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeHashes.evalShingleHashes($c, $n);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** winnow_fp(text): min xxhash64 over strided character k-grams of the
    * whitespace-normalized lowercased text — bit-identical to
    * TextAnalysis.winnowFingerprint. */
  case class WinnowFingerprintExpr(child: Expression, k: Int, stride: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_winnow_fp"
    override protected def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(evalWinnow(input.asInstanceOf[UTF8String], k, stride))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeHashes.evalWinnow($c, $k, $stride);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** simhash64(text): 64-bit SimHash over word n-gram shingles. */
  case class SimHash64Expr(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"
    override protected def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(evalSimhash(input.asInstanceOf[UTF8String], n))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeHashes.evalSimhash($c, $n);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // Spark 4's Column wraps ColumnNode; ColumnBridge hops to Catalyst.
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def minhashSig(c: Column, n: Int = 3, k: Int = 64): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(c), n, k))

  def shingleHashes(c: Column, n: Int = 3): Column =
    ColumnBridge.column(ShingleHashesExpr(ColumnBridge.expression(c), n))

  def winnowFingerprint(c: Column, k: Int = 16, stride: Int = 4): Column =
    ColumnBridge.column(WinnowFingerprintExpr(ColumnBridge.expression(c), k, stride))

  def simhash64(c: Column, n: Int = 2): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(c), n))

  /** Register graft_minhash_sig / graft_simhash64 / graft_cosine for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig", exprs => MinHashSigExpr(exprs.head, 3, 64), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64Expr(exprs.head, 2), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => NativeVector.CosineSimExpr(exprs.head, exprs(1)), "scala_udf")
    // coalesce to 'und' so SQL agrees with the Column API (and with the
    // pure fold, whose when-chain bottoms out at the 'und' literal)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_langid", exprs => org.apache.spark.sql.catalyst.expressions.Coalesce(
        Seq(NativeText.LangIdExpr(exprs.head),
          org.apache.spark.sql.catalyst.expressions.Literal("und"))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_top_k",
      exprs => NativeTopK.BoundedTopK(exprs(0), exprs(1),
        NativeTopK.kOf(exprs(2))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_text_stats", exprs => NativeText.TextStatsExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize", exprs => NativeText.NormalizeExpr(exprs.head,
        NativeText.formNameOf(exprs)), "scala_udf")
    NativeSketches.sqlBuilders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
  }
}

/** Engine-owned session-builder defaults — the ONE place the tuned
  * session shape lives, so the benched execution and a user session
  * built through this helper agree (round-16 verdict: the AQE fan-out
  * floor must not be a bench-only tune).
  *
  * `SparkSessionExtensions` has no conf hook, so extensions alone cannot
  * carry these; apply them at build time:
  * {{{
  * val spark = GraftExtensions.sessionDefaults(
  *   SparkSession.builder().withExtensions(new GraftExtensions)).getOrCreate()
  * }}}
  */
object GraftExtensions {
  /** AQE small-exchange fan-out floor (OPTIMIZATION_r16.md §2 has the
    * A/B sweep): with `parallelismFirst` the coalesce target is
    * max(bytes/parallelism, minPartitionSize), so Spark's 1 MB default
    * serializes compute-heavy stages behind sub-cores·1MB exchanges
    * onto 1-2 tasks while the cluster idles. 768k binds ONLY below
    * cores·1MB — at production shuffle sizes the advisory governs and
    * the knob is inert — so it is scale-safe by construction.
    * `SPARK_GRAFT_MIN_PARTITION_SIZE` overrides for A/Bs. */
  def sessionDefaults(
      b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "768k"))
}

/** Session extension hook: --conf spark.sql.extensions=graft.functions.GraftExtensions */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_sig"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NativeHashes.MinHashSigExpr].getName, "graft_minhash_sig"),
        (exprs: Seq[Expression]) => NativeHashes.MinHashSigExpr(exprs.head, 3, 64)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash64"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NativeHashes.SimHash64Expr].getName, "graft_simhash64"),
        (exprs: Seq[Expression]) => NativeHashes.SimHash64Expr(exprs.head, 2)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NativeVector.CosineSimExpr].getName, "graft_cosine"),
        (exprs: Seq[Expression]) => NativeVector.CosineSimExpr(exprs.head, exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_langid"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NativeText.LangIdExpr].getName, "graft_langid"),
        (exprs: Seq[Expression]) => org.apache.spark.sql.catalyst.expressions.Coalesce(
          Seq(NativeText.LangIdExpr(exprs.head),
            org.apache.spark.sql.catalyst.expressions.Literal("und")))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_top_k"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NativeTopK.BoundedTopK].getName, "graft_top_k"),
        (exprs: Seq[Expression]) => NativeTopK.BoundedTopK(exprs(0), exprs(1),
          NativeTopK.kOf(exprs(2)))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_zorder"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NativeZorder.InterleaveExpr].getName, "graft_zorder"),
        (exprs: Seq[Expression]) => NativeZorder.zorderExpr(exprs)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_text_stats"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NativeText.TextStatsExpr].getName, "graft_text_stats"),
        (exprs: Seq[Expression]) => NativeText.TextStatsExpr(exprs.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_normalize"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NativeText.NormalizeExpr].getName, "graft_normalize"),
        (exprs: Seq[Expression]) => NativeText.NormalizeExpr(exprs.head,
          NativeText.formNameOf(exprs))))
    // the sketch family (KLL / theta / Misra-Gries), same builders as
    // the temp-function path so SQL text works in both session shapes
    NativeSketches.sqlBuilders.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            NativeSketches.getClass.getName, name),
          builder))
    }
    // SQL table functions: graft_lake / _at / _asof / _changes /
    // _history — the commit log's spark.sql front door
    graft.sources.LakeTvf.builders.foreach { case (name, builder) =>
      e.injectTableFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            graft.sources.LakeTvf.getClass.getName, name),
          builder))
    }
    // SQL DML front door: DELETE FROM / UPDATE / MERGE INTO
    // graft_lake('dir') or a graft-catalog table name, plus
    // VERSION/TIMESTAMP AS OF sugar — minimal text surgery, then
    // Spark's own grammar, then CommitLog verbs
    e.injectParser((session, delegate) =>
      new graft.sources.LakeSqlParser(delegate, Option(session)))
    // graft catalog tables: reads swap to the CommitLog snapshot plan,
    // v2 writes (INSERT INTO/OVERWRITE, CTAS, writeTo) land commits
    e.injectResolutionRule(s => new graft.catalog.ResolveGraftCatalogOps(s))
    // optimizer rules: joins the operator-optimization fixed point, so the
    // folded plan is itself optimized further (filter merge, pruning)
    e.injectOptimizerRule(_ => graft.plans.FoldCountOverReplicateRows)
    e.injectOptimizerRule(_ => graft.plans.RewriteDecimalSumAsScaledLong)
    e.injectOptimizerRule(_ => graft.plans.EliminateRiDimJoin)
    e.injectOptimizerRule(s => new graft.plans.RewriteAggregateOnView(s))
  }
}

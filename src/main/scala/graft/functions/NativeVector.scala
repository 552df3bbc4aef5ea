package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine-similarity expression for embedding columns.
  *
  * The pure formulation ([[graft.sim.Similarity.cosine]]: zip_with +
  * aggregate) is semantically right but higher-order functions evaluate
  * interpreted, per element, with a lambda variable bind — the hot loop
  * of every similarity-search operator. This expression runs one fused
  * primitive-double loop (dot, |a|², |b|² in a single pass) inside
  * whole-stage codegen.
  *
  * Bit-identical to the pure version by construction: each accumulator
  * folds left in element order, exactly like the aggregate() folds; the
  * guard chain replicates `when(denom > 0, dot/denom).otherwise(0.0)`
  * including its null semantics (mismatched lengths → null, any null
  * element → 0.0). NativeVectorSpec pins the equivalence.
  */
object NativeVector {

  /** Squared L2 norm of one side, folded in element order like the pure
    * aggregate(); -1.0 is the "null norm" sentinel (a null element nulls
    * the whole fold). */
  private def normSq(v: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = v.numElements()
    while (i < n) {
      if (v.isNullAt(i)) return -1.0
      val x = v.getDouble(i)
      s += x * x
      i += 1
    }
    s
  }

  /** Shared by interpreted eval and generated code. Returns null (boxed)
    * only for mismatched lengths with BOTH norms positive — zip_with's
    * null padding nulls the dot, but `when(denom > 0, ...)` still takes
    * the otherwise(0.0) branch when either independently-computed norm
    * is zero or null. */
  def evalCosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) {
      val na = normSq(a)
      val nb = normSq(b)
      return if (na > 0 && nb > 0) null else java.lang.Double.valueOf(0.0)
    }
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // a null element nulls the dot AND the same-side norm → null denom
      // → when() falls through to 0.0 in the pure version
      if (a.isNullAt(i) || b.isNullAt(i)) return java.lang.Double.valueOf(0.0)
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb)
    java.lang.Double.valueOf(if (denom > 0) dot / denom else 0.0)
  }

  case class CosineSimExpr(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    // Coerce (or reject) non-double arrays at analysis time: external
    // callers hit this via SQL/extensions on array<float> embedding
    // columns, where a raw getDouble over 4-byte elements would read
    // garbage instead of failing.
    // Seq[DataType] (covariant) — AbstractDataType is private[sql] in Spark 4
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_cosine"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      evalCosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("cos")
        s"""java.lang.Double $r = graft.functions.NativeVector.evalCosine($a, $b);
           |if ($r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** cosine(a, b) over two array<double> columns, codegen'd. */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

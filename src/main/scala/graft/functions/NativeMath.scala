package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Bit-stable transcendental math for oracle-compared doubles.
  *
  * Spark's `log()` (UnaryMathExpression) evaluates AND code-gens
  * `java.lang.Math.log`. On HotSpot that function is only spec'd to
  * 1 ulp, and its two implementations — the interpreter path (which
  * calls `StrictMath.log`, exact fdlibm) and the C2 intrinsic (hand
  * assembly) — may differ in the last ulp. Which one computes a given
  * ROW depends on JIT state: invocation counts, OSR points, and WHEN the
  * background compiler installs the compiled generated class — i.e. on
  * machine load and timing. The same query over the same data can
  * therefore produce last-ulp-different doubles run to run in one JVM.
  * For most numerics that is noise far below any rounding grain; for a
  * value that must HASH-MATCH a foreign engine after per-term rounding
  * (q150's KL divergence), it is the one operator in the expression tree
  * whose output is not a pure function of its input.
  *
  * [[StrictLogExpr]] removes it: eval and generated code both call
  * `java.lang.StrictMath.log` — fdlibm-exact, never intrinsified into
  * anything looser, identical on every JVM, every JIT state, every
  * architecture. Cost: fdlibm log is somewhat slower than the intrinsic,
  * which is irrelevant off the hot path (q150 computes one value per
  * vocabulary term).
  */
object NativeMath {

  /** `StrictMath.log(child)` — the run-deterministic natural log. */
  case class StrictLogExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == DoubleType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"graft_strict_ln needs DOUBLE, got ${child.dataType}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_strict_ln"

    override protected def nullSafeEval(input: Any): Any =
      StrictMath.log(input.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"java.lang.StrictMath.log($c)")

    override protected def withNewChildInternal(
        newChild: Expression): StrictLogExpr = copy(child = newChild)
  }

  /** Column wrapper: bit-stable `ln(c)`. */
  def strictLn(c: Column): Column =
    ColumnBridge.column(StrictLogExpr(ColumnBridge.catalystExpression(c)))
}

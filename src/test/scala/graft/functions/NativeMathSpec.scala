package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[NativeMath.StrictLogExpr]]: both execution paths (interpreted eval
  * and whole-stage codegen) must return EXACTLY `StrictMath.log` — the
  * point of the expression is that its output is a pure function of its
  * input, independent of JIT state, which `Math.log` does not guarantee.
  */
class NativeMathSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("strictLn == StrictMath.log bit for bit, through codegen") {
    val xs = Seq(1e-300, 1e-9, 0.1, 0.5, 1.0, math.E, 2.0, 3.7, 1e9, 1e300)
    val got = xs.toDF("x")
      .select(NativeMath.strictLn(col("x")).as("y"))
      .as[Double].collect().toSeq
    val want = xs.map(StrictMath.log)
    assert(got.map(java.lang.Double.doubleToRawLongBits) ==
      want.map(java.lang.Double.doubleToRawLongBits),
      s"\ngot:  $got\nwant: $want")
    // nulls propagate; non-positive inputs follow StrictMath (NaN / -Inf)
    val edge = Seq[(java.lang.Double, Int)]((null, 0), (0.0, 1), (-1.0, 2))
      .toDF("x", "i")
      .select(NativeMath.strictLn(col("x")).as("y")).collect()
    assert(edge.exists(_.isNullAt(0)))
    assert(edge.exists(r => !r.isNullAt(0) &&
      r.getDouble(0).isNegInfinity))
    assert(edge.exists(r => !r.isNullAt(0) && r.getDouble(0).isNaN))
  }
}

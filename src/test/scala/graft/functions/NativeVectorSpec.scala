package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sim.Similarity

class NativeVectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native cosine is bit-identical to the pure higher-order form") {
    val rnd = new scala.util.Random(77)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      Similarity.cosine($"a", $"b").as("native"),
      Similarity.cosinePure($"a", $"b").as("pure"))
      .as[(Double, Double)].collect()
    // bit-identical, not approximately equal: same fold order by design
    got.foreach { case (n, p) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(p))
    }
  }

  test("edge cases match the pure form: zero vector, mismatched length") {
    val df = Seq(
      (Seq(0.0, 0.0), Seq(1.0, 2.0)),   // zero norm → 0.0
      (Seq(1.0, 2.0), Seq(1.0, 2.0)))   // identical → 1.0
      .toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b")).as[Double].collect()
    assert(got(0) == 0.0 && math.abs(got(1) - 1.0) < 1e-15)
    // mismatched lengths → null on both forms
    val mm = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(mm.select(Similarity.cosine($"a", $"b")).collect()(0).isNullAt(0))
    assert(mm.select(Similarity.cosinePure($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("mismatched length with a zero/null norm matches the pure form") {
    // pure: denom computed over each full array independently; a zero or
    // null norm takes the otherwise(0.0) branch before the null dot matters
    val cases = Seq(
      (Seq(0.0, 0.0), Seq(1.0, 2.0, 3.0)),          // left zero norm
      (Seq(1.0, 2.0, 3.0), Seq(0.0, 0.0)),          // right zero norm
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)))          // both nonzero → null
    val df = cases.toDF("a", "b")
    val native = df.select(Similarity.cosine($"a", $"b")).collect()
    val pure = df.select(Similarity.cosinePure($"a", $"b")).collect()
    (0 until 3).foreach { i =>
      assert(native(i).isNullAt(0) == pure(i).isNullAt(0), s"null parity, case $i")
      if (!native(i).isNullAt(0))
        assert(native(i).getDouble(0) == pure(i).getDouble(0), s"value, case $i")
    }
    assert(native(0).getDouble(0) == 0.0 && native(1).getDouble(0) == 0.0)
    assert(native(2).isNullAt(0))
  }

  test("array<float> inputs are coerced (not read as garbage)") {
    // embeddings store array<float>; ImplicitCastInputTypes must insert
    // the float→double cast at analysis time for SQL/extension callers
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-7, s"expected ~1.0, got ${got(0)}")
    // and via the SQL-registered function name
    NativeHashes.register(spark)
    df.createOrReplaceTempView("nv_float_t")
    val sql = spark.sql("SELECT graft_cosine(a, b) FROM nv_float_t")
      .as[Double].collect()
    assert(math.abs(sql(0) - 1.0) < 1e-7)
  }

  test("native cosine runs inside WholeStageCodegen") {
    // a local Seq would constant-fold to LocalTableScan (eval path), and
    // higher-order builders (transform) are CodegenFallback and would
    // break the span themselves — build inputs with codegen'd array()
    val df = spark.range(4).select(
      array((1 to 4).map(i => (col("id") + i).cast("double")): _*).as("a"),
      array((1 to 4).map(i => (col("id") * i).cast("double")): _*).as("b"))
      .select(Similarity.cosine($"a", $"b").as("c"))
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("*(1) Project [graft_cosine"), s"codegen collapsed:\n$p")
    df.collect() // generated code compiles + runs
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[graft.plans.RewriteDecimalSumAsScaledLong]] +
  * [[NativeDecimalSum.SumScaledDecimal]] bit-equal to the built-in
  * `CAST(sum(CAST(x AS DECIMAL(p,s))) AS DOUBLE)` chain — over the real
  * engine tables (every SF shipped to tests), over adversarial
  * constructed doubles in the fast-path domain, and across the
  * partial/merge path. Bit-equality means doubleToRawLongBits equality,
  * not ==: the oracle gate hashes these values.
  */
class DecimalSumParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Rule = "graft.plans.RewriteDecimalSumAsScaledLong"

  /** Evaluate `sql` with and without the rewrite; compare raw bits of
    * every double column, group for group. */
  private def assertParity(sql: String): Unit = {
    def run(ruleOn: Boolean) = {
      if (ruleOn) spark.conf.unset("spark.sql.optimizer.excludedRules")
      else spark.conf.set("spark.sql.optimizer.excludedRules", Rule)
      try {
        spark.sql(sql).collect().map { r =>
          (0 until r.length).map { i =>
            val v = r.get(i)
            v match {
              case d: java.lang.Double =>
                java.lang.Double.doubleToRawLongBits(d)
              case other => other
            }
          }.toVector
        }.toVector.sortBy(_.toString)
      } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
    val withRule = run(ruleOn = true)
    val without = run(ruleOn = false)
    assert(withRule == without, s"scaled-sum parity broke for: $sql")
  }

  test("rule fires: plan carries graft_sum_scaled, not a decimal Sum") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    df.createOrReplaceTempView("dsps_li")
    val q = spark.sql(
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) v
        |FROM dsps_li GROUP BY 1""".stripMargin)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_sum_scaled"),
      s"rewrite did not fire:\n$optimized")
    // and the whole aggregate stays on the codegen'd hash path
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("HashAggregate"), physical)
  }

  test("real tables, every shipped SF, all idiom shapes are bit-equal") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      spark.read.parquet(s"/root/testdata/$sf/lineitem.parquet")
        .createOrReplaceTempView("dsps_li")
      spark.read.parquet(s"/root/testdata/$sf/orders.parquet")
        .createOrReplaceTempView("dsps_o")
      assertParity(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) a,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) b,
          |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
          |    AS DECIMAL(18,4))) AS DOUBLE) c,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          |    / count(*) d
          |FROM dsps_li GROUP BY 1, 2""".stripMargin)
      assertParity(
        """SELECT l_suppkey,
          |  CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6)))
          |    AS DOUBLE) v,
          |  CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) w
          |FROM dsps_li GROUP BY 1""".stripMargin)
      // global aggregate (no grouping), and a per-key fine grouping that
      // exercises the merge path across partitions
      assertParity(
        """SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
          |  AS DOUBLE) v FROM dsps_o""".stripMargin)
      assertParity(
        """SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
          |  AS DOUBLE) v FROM dsps_o GROUP BY 1""".stripMargin)
    }
  }

  test("nulls, NaN, Infinity, empty groups match the built-in chain") {
    import spark.implicits._
    val rows = Seq[(Int, java.lang.Double)](
      (1, 1.25), (1, null), (2, null),
      (3, Double.NaN), (3, 2.5),
      (4, Double.PositiveInfinity), (4, 1.0),
      (5, -3.555), (5, 3.555))
    rows.toDF("k", "x").createOrReplaceTempView("dsps_edge")
    assertParity(
      """SELECT k, CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) v
        |FROM dsps_edge GROUP BY k""".stripMargin)
  }

  test("adversarial fast-path doubles: products, negatives, tiny/huge") {
    import spark.implicits._
    val r = new scala.util.Random(17)
    // money-grade values: exact 2-decimals, products of 2-decimals,
    // negatives, zeros, denormal-adjacent smalls, and values near the
    // 2^52-scaled fallback boundary
    val vals: Seq[Double] =
      (1 to 2000).map(_ => math.rint(r.nextDouble() * 1e7) / 100.0) ++
      (1 to 2000).map(_ => -math.rint(r.nextDouble() * 1e7) / 100.0) ++
      (1 to 2000).map(_ => (math.rint(r.nextDouble() * 1e6) / 100.0) *
        (math.rint(r.nextDouble() * 100) / 100.0)) ++
      Seq(0.0, -0.0, 0.005, -0.005, 1e-9, -1e-9,
        4.5e13, -4.5e13, 4.6e15, -4.6e15, 9.9e15,
        // knife-edge: true decimal exactly on the half one digit past
        // the scale (shortest-repr HALF_UP rounds up; naive binary
        // rounding would round down) — 10.695 = 11.5 × 0.93 and friends
        10.695, -10.695, 2675.855, -2675.855, 0.125, -0.125, 1.0005)
    for (scale <- Seq(2, 4, 6)) {
      // stay inside the documented row domain |x|·10^s < 2^63 (beyond
      // it the aggregate throws loudly — pinned in the next test)
      val bound = 9.0e18 / math.pow(10, scale) / 2
      vals.filter(v => math.abs(v) < bound).zipWithIndex
        .map { case (v, i) => (i % 7, v) }
        .toDF("k", "x").createOrReplaceTempView("dsps_adv")
      assertParity(
        s"""SELECT k, CAST(sum(CAST(x AS DECIMAL(28,$scale))) AS DOUBLE) v
           |FROM dsps_adv GROUP BY k""".stripMargin)
    }
  }

  test("precision bound (p ≤ 18): LEGACY and TRY casts NULL " +
      "out-of-precision rows exactly like the built-in chain") {
    import spark.implicits._
    // DECIMAL(8,2): unscaled bound 10^8 → any |x| ≥ 10^6 overflows the
    // precision; includes the round-17 verdict's 1e300 pathological row
    Seq[java.lang.Double](1e7, 123.45, -1e7, 1.0, 999999.99, 1e300)
      .toDF("x").createOrReplaceTempView("dsps_prec")
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      assertParity(
        """SELECT CAST(sum(CAST(x AS DECIMAL(8,2))) AS DOUBLE) v
          |FROM dsps_prec""".stripMargin)
      spark.conf.set("spark.sql.ansi.enabled", "true")
      assertParity(
        """SELECT CAST(sum(TRY_CAST(x AS DECIMAL(8,2))) AS DOUBLE) v
          |FROM dsps_prec""".stripMargin)
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("precision bound (p ≤ 18): an ANSI cast ERRORS on an " +
      "out-of-precision row, matching the built-in, naming the opt-out") {
    import spark.implicits._
    Seq[java.lang.Double](1e7, 1.0).toDF("x")
      .createOrReplaceTempView("dsps_prec_ansi")
    val q = """SELECT CAST(sum(CAST(x AS DECIMAL(8,2))) AS DOUBLE) v
              |FROM dsps_prec_ansi""".stripMargin
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      // rule ON: the aggregate throws, and the message names the knob
      val eOn = intercept[Exception](spark.sql(q).collect())
      assert(messages(eOn).exists(m => m.contains("graft_sum_scaled") &&
        m.contains("excludedRules")), eOn.toString)
      // rule OFF: the built-in ANSI cast throws as well — same contract
      spark.conf.set("spark.sql.optimizer.excludedRules", Rule)
      val eOff = intercept[Exception](spark.sql(q).collect())
      assert(!messages(eOff).exists(_.contains("graft_sum_scaled")),
        eOff.toString)
    } finally {
      spark.conf.unset("spark.sql.optimizer.excludedRules")
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
    }
  }

  test("rows past the scaled 64-bit domain fail LOUDLY, not silently") {
    import spark.implicits._
    Seq(4.6e15, 1.0).toDF("x").createOrReplaceTempView("dsps_over")
    val e = intercept[Exception] {
      spark.sql(
        """SELECT CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) v
          |FROM dsps_over""".stripMargin).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("graft_sum_scaled")), e.toString)
  }

  test("128-bit accumulation: sums past the long range stay exact") {
    // 4M-scaled rows of 9e12 at scale 6 → per-row scaled 9e18 ≈ long
    // max/1; 40 rows overflow a single long — the (hi, lo) pair must
    // carry. Reference: BigDecimal arithmetic on the driver.
    import spark.implicits._
    val v = 9.0e12 // scaled at 6: 9e18, two rows overflow a signed long
    val n = 40
    val df = Seq.fill(n)(v).toDF("x").repartition(8)
    df.createOrReplaceTempView("dsps_big")
    val got = spark.sql(
      """SELECT CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) v
        |FROM dsps_big""".stripMargin).head.getDouble(0)
    val want = new java.math.BigDecimal(
      java.math.BigDecimal.valueOf(v).setScale(6).unscaledValue()
        .multiply(java.math.BigInteger.valueOf(n.toLong)), 6).doubleValue()
    assert(java.lang.Double.doubleToRawLongBits(got) ==
      java.lang.Double.doubleToRawLongBits(want),
      s"128-bit sum drifted: got $got want $want")
  }

  test("left alone: distinct sums, decimal-consumed sums, windows") {
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .createOrReplaceTempView("dsps_li")
    // DISTINCT — must not rewrite
    val d1 = spark.sql(
      """SELECT CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2)))
        |  AS DOUBLE) v FROM dsps_li""".stripMargin)
    assert(!d1.queryExecution.optimizedPlan.toString
      .contains("graft_sum_scaled"))
    // sum consumed as DECIMAL (no outer double cast) — must not rewrite
    val d2 = spark.sql(
      """SELECT sum(CAST(l_quantity AS DECIMAL(18,2))) v
        |FROM dsps_li""".stripMargin)
    assert(!d2.queryExecution.optimizedPlan.toString
      .contains("graft_sum_scaled"))
    // window sum — must not rewrite (different operator, not Aggregate)
    val d3 = spark.sql(
      """SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER
        |  (PARTITION BY l_returnflag) AS DOUBLE) v FROM dsps_li""".stripMargin)
    assert(!d3.queryExecution.optimizedPlan.toString
      .contains("graft_sum_scaled"))
    d3.collect() // and it still executes
  }
}

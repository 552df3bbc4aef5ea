package graft

import org.apache.spark.sql.SparkSession

/** Expression-level micro-bench used by the round-16 measure pass
  * (OPTIMIZATION_r16.md finding 3): times aggregate shapes over the
  * sf0.1 lineitem with min-of-3 noop writes. Tooling only — not part
  * of the driver contract. */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val RULE = "graft.plans.RewriteDecimalSumAsScaledLong"
    def withRule[A](on: Boolean)(f: => A): A = {
      if (on) spark.conf.unset("spark.sql.optimizer.excludedRules")
      else spark.conf.set("spark.sql.optimizer.excludedRules", RULE)
      f
    }
    val shapes = Seq(
      ("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)", "l_returnflag"),
      ("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)", "l_returnflag"),
      ("CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)", "l_returnflag"),
      ("CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) AS DOUBLE)", "l_orderkey % 1000"),
      ("CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)", "l_suppkey"))
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val li = spark.read.parquet(s"/root/testdata/$sf/lineitem.parquet")
      li.createOrReplaceTempView("li")
      var bad = 0L
      for ((agg, key) <- shapes) {
        val q = s"SELECT $key AS k, $agg AS v FROM li GROUP BY $key"
        val a = withRule(true) { spark.sql(q).collect().map(r => (r.get(0), java.lang.Double.doubleToRawLongBits(r.getDouble(1)))).toMap }
        val b = withRule(false) { spark.sql(q).collect().map(r => (r.get(0), java.lang.Double.doubleToRawLongBits(r.getDouble(1)))).toMap }
        val diff = (a.keySet ++ b.keySet).count(k => a.get(k) != b.get(k))
        if (diff > 0) { bad += diff; println(s"MISMATCH $sf $agg: $diff groups") }
      }
      println(s"$sf parity: ${if (bad == 0) "OK" else s"$bad BAD"}")
    }
    // plan check: rule fired?
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    li.createOrReplaceTempView("li")
    val plan = spark.sql("SELECT l_returnflag, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) v FROM li GROUP BY 1").queryExecution.executedPlan.toString
    println("plan contains graft_sum_scaled: " + plan.contains("graft_sum_scaled"))
    // speed
    def time(tag: String, sql: String): Unit = {
      val d = spark.sql(sql)
      d.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); d.write.format("noop").mode("overwrite").save(); (System.nanoTime()-t0)/1e6 }
      println(f"$tag%-26s min=${ts.min}%8.1f ms")
    }
    val q1 = """SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) a,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) b,
      CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) c,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) d,
      count(*) e FROM li GROUP BY 1,2 ORDER BY 1,2"""
    withRule(true) { time("q1 shape WITH rule", q1) }
    withRule(false) { time("q1 shape WITHOUT rule", q1) }
    spark.stop()
  }
}

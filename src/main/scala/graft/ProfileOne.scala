package graft

import org.apache.spark.sql.SparkSession

/** Per-query profiling main: runs each named registered query twice
  * (cold, then warm — separating parquet-footer/page-cache/JIT effects
  * from steady-state cost) against SPARK_GRAFT_SF_DIR. Companion to
  * [[Explain]] for the measure-don't-guess loop.
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B harness: SPARK_GRAFT_EXCLUDE_RULES=<ruleName,...> profiles the
    // same query with named optimizer rules switched off
    sys.env.get("SPARK_GRAFT_EXCLUDE_RULES")
      .foreach(spark.conf.set("spark.sql.optimizer.excludedRules", _))
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"$name first  ${(System.nanoTime()-t0)/1e9}%.2f s")
      graft.runtime.Lifetime.releaseAll(spark, blocking = true)
      val t1 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"$name second ${(System.nanoTime()-t1)/1e9}%.2f s")
      graft.runtime.Lifetime.releaseAll(spark, blocking = true)
    }
    spark.stop()
  }
}

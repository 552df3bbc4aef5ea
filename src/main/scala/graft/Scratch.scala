package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling experiments (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val li = graft.tables.Tables.lineitem(spark, sfDir)

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // A: qty percentiles via count-compaction (as in q40)
    time("qty_compact") {
      li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("f"))
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5, f)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.85, f)"), 6).as("p85"))
        .write.format("noop").mode("overwrite").save()
    }
    // B: price p99 via raw exact percentile
    time("price_raw") {
      li.groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99_price"))
        .write.format("noop").mode("overwrite").save()
    }
    // warm repeats
    time("qty_compact2") {
      li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("f"))
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5, f)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.85, f)"), 6).as("p85"))
        .write.format("noop").mode("overwrite").save()
    }
    time("price_raw2") {
      li.groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99_price"))
        .write.format("noop").mode("overwrite").save()
    }
    // D: the full current q40 (join of two aggs)
    time("q40_full") {
      SparkEntry.queries("q40_percentiles")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("q40_full2") {
      SparkEntry.queries("q40_percentiles")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    // E: single-pass: qty via compaction can't merge with raw price scan;
    // instead one groupBy over raw rows with all three percentiles
    time("q40_onepass") {
      li.groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.85)"), 6).as("p85"),
          round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99_price"))
        .orderBy(col("l_returnflag"))
        .write.format("noop").mode("overwrite").save()
    }
    time("q40_onepass2") {
      li.groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.85)"), 6).as("p85"),
          round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99_price"))
        .orderBy(col("l_returnflag"))
        .write.format("noop").mode("overwrite").save()
    }
    // C: price p99 via distributed sort + rank interpolation (exact)
    time("price_sortrank") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
      val n = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val ranked = li.select(col("l_returnflag"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
      val j = ranked.join(broadcast(n), "l_returnflag")
        .withColumn("k", (col("n") - 1) * lit(0.99))
        .filter(col("rn") - 1 >= floor(col("k")) && col("rn") - 1 <= ceil(col("k")))
      j.groupBy(col("l_returnflag"))
        .agg(round(
          when(count(lit(1)) === 1, first(col("l_extendedprice")))
            .otherwise(
              min(col("l_extendedprice")) * (ceil(first(col("k"))) - first(col("k"))) +
              max(col("l_extendedprice")) * (first(col("k")) - floor(first(col("k"))))),
          6).as("p99_price"))
        .write.format("noop").mode("overwrite").save()
    }
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

class BucketedLakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed fact⋈fact join runs without a shuffle exchange") {
    val dir = Files.createTempDirectory("bucketed").toString
    val sf = "/root/testdata/sf0.001"
    BucketedLake.writeBucketed(
      Tables.lineitem(spark, sf), "b_lineitem", s"$dir/li", "l_orderkey", 8)
    BucketedLake.writeBucketed(
      Tables.orders(spark, sf), "b_orders", s"$dir/o", "o_orderkey", 8)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try {
        val j = BucketedLake.table(spark, "b_lineitem")
          .join(BucketedLake.table(spark, "b_orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
        val rows = j.collect() // materialize so executedPlan is final
        assert(rows.map(_.getLong(1)).sum == 6000L)
        j
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // join itself must be shuffle-free (the single agg exchange on the
    // 3-row groupBy result is fine and unavoidable)
    val plan = joined.queryExecution.executedPlan.toString()
    val joinSection = plan.split("SortMergeJoin").last
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"join inputs re-shuffled despite bucketing:\n$plan")
  }

  test("non-bucketed same join DOES shuffle (negative control)") {
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("Exchange hashpartitioning"))
      assert(!BucketedLake.isShuffleFree(j))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("isShuffleFree catches round-robin and single-partition exchanges too") {
    val df = Tables.nation(spark, "/root/testdata/sf0.001")
    assert(!BucketedLake.isShuffleFree(df.repartition(4)), "round-robin missed")
    assert(!BucketedLake.isShuffleFree(df.agg(count(lit(1)))), "global agg missed")
    // a broadcast join is NOT a shuffle
    val b = Tables.region(spark, "/root/testdata/sf0.001")
    val j = df.join(broadcast(b), col("n_regionkey") === col("r_regionkey"))
    assert(BucketedLake.isShuffleFree(j), "broadcast miscounted as shuffle")
  }
}

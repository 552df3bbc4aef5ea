package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S6/S9 executed end-to-end against a real database: Spark ships
  * embedded Derby (its Hive-metastore store), so the JDBC scan and
  * append sink run against `jdbc:derby:memory:` — the same connector
  * path a user points at Postgres (the reference's primary store,
  * /root/reference/src/database.py:19-22).
  */
class JdbcRoundTripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  System.setProperty("derby.stream.error.file", "target/derby.log")
  private val url = "jdbc:derby:memory:graft_jdbc_spec;create=true"

  test("jdbcAppend → jdbcTable round-trips rows and schema") {
    import spark.implicits._
    val flows = Seq(
      (1L, "EQP001", 55.5, "2024-01-01"),
      (2L, "EQP002", 61.0, "2024-01-01"),
      (3L, "EQP001", 48.2, "2024-01-02")
    ).toDF("id", "equipment", "speed", "pubdate")
    Sources.jdbcAppend(flows, url, "flows_rt")
    val back = Sources.jdbcTable(spark, url, "flows_rt")
    assert(back.columns.map(_.toLowerCase).sorted.toSeq ==
      Seq("equipment", "id", "pubdate", "speed"))
    val got = back.select(col("id"), col("equipment"), col("speed"), col("pubdate"))
      .as[(Long, String, Double, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "EQP001", 55.5, "2024-01-01"),
      (2L, "EQP002", 61.0, "2024-01-01"),
      (3L, "EQP001", 48.2, "2024-01-02")))
  }

  test("append mode appends — two writes, doubled rows (reference if_exists=append)") {
    import spark.implicits._
    val rows = Seq((10L, "a"), (11L, "b")).toDF("id", "tag")
    Sources.jdbcAppend(rows, url, "append_twice")
    Sources.jdbcAppend(rows, url, "append_twice")
    assert(Sources.jdbcTable(spark, url, "append_twice").count() == 4)
  }

  test("partitioned scan shards the read and loses no rows") {
    import spark.implicits._
    val big = spark.range(0, 1000).select(col("id"),
      (col("id") % 7).cast("string").as("bucket"))
    Sources.jdbcAppend(big, url, "sharded")
    val back = Sources.jdbcTable(spark, url, "sharded",
      partitionColumn = Some(("id", 0L, 1000L, 4)))
    assert(back.rdd.getNumPartitions == 4, "partitionColumn bounds ignored")
    assert(back.count() == 1000)
    assert(back.agg(sum(col("id"))).as[Long].head() == 499500L)
  }

  test("filters and column pruning push into the generated SQL") {
    val back = Sources.jdbcTable(spark, url, "sharded")
      .filter(col("id") < 10).select(col("id"))
    // JDBCRelation prints its pushed filters/columns in the plan
    val plan = back.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters"), s"no pushdown marker:\n$plan")
    assert(back.count() == 10)
  }
}

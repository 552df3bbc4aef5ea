package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NativeTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g")
      .agg(NativeTopK.topK($"v", $"id", k).as("tops"))
      .select($"g", posexplode($"tops").as(Seq("r", "t")))
      .select($"g", ($"r" + 1).as("rank"), $"t.id".as("id"), $"t.sort_key".as("v"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id".asc)
    df.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select($"g", $"rank", $"id", $"v".cast("double").as("v"))
  }

  test("matches the window top-k on random data with ties, across partitions") {
    val rnd = new scala.util.Random(99)
    // coarse values force plenty of ties → the id tie-break must decide
    val rows = Seq.fill(5000)((rnd.nextInt(7), rnd.nextInt(40).toDouble, rnd.nextLong().abs))
      .zipWithIndex.map { case ((g, v, _), i) => (g, v, i.toLong) }
    val df = rows.toDF("g", "v", "id").repartition(13) // exercise partial merges
    val got = viaAgg(df, 10).as[(Int, Int, Long, Double)].collect().toSet
    val want = viaWindow(df, 10).as[(Int, Int, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("k larger than the group emits the whole group, ordered") {
    val df = Seq((1, 5.0, 10L), (1, 7.0, 11L), (1, 5.0, 9L)).toDF("g", "v", "id")
    val got = viaAgg(df, 100).as[(Int, Int, Long, Double)].collect().toList.sorted
    assert(got == List((1, 1, 11L, 7.0), (1, 2, 9L, 5.0), (1, 3, 10L, 5.0)))
  }

  test("NaN sort keys rank first (Spark's NaN-greatest order), independent of arrival") {
    val rows = Seq((1, Double.NaN, 1L), (1, 5.0, 2L), (1, 7.0, 3L))
    Seq(rows, rows.reverse).foreach { r =>
      val got = viaAgg(r.toDF("g", "v", "id"), 2)
        .orderBy($"rank").select($"id").as[Long].collect().toList
      assert(got == List(1L, 3L), s"arrival order changed the result: $got")
    }
    // parity with the window idiom on the same data
    val w = viaWindow(rows.toDF("g", "v", "id"), 2)
      .orderBy($"rank").select($"id").as[Long].collect().toList
    assert(w == List(1L, 3L))
  }

  test("null sort keys and ids are skipped, not emitted") {
    val df = Seq((1, Some(3.0), Some(1L)), (1, None, Some(2L)), (1, Some(4.0), None))
      .toDF("g", "v", "id")
    val got = viaAgg(df, 5).select($"id").as[Long].collect().toList
    assert(got == List(1L))
  }

  test("graft_top_k is callable from SQL") {
    NativeHashes.register(spark)
    Seq((1, 5.0, 10L), (1, 9.0, 11L), (2, 3.0, 20L))
      .toDF("g", "v", "id").createOrReplaceTempView("ntk_t")
    val got = spark.sql(
      "SELECT g, graft_top_k(v, id, 1)[0].id AS best FROM ntk_t GROUP BY g ORDER BY g")
      .as[(Int, Long)].collect().toList
    assert(got == List((1, 11L), (2, 20L)))
  }

  test("plan aggregates partially — no Window, no full sort of the input") {
    val df = spark.range(1000)
      .select(($"id" % 7).as("g"), ($"id" % 31).cast("double").as("v"), $"id".as("id"))
    val agg = df.groupBy($"g").agg(NativeTopK.topK($"v", $"id", 5).as("tops"))
    val p = agg.queryExecution.executedPlan.toString()
    assert(p.contains("partial_graft_top_k"), s"no map-side partial top-k:\n$p")
    assert(!p.contains("Window"), s"window crept in:\n$p")
    agg.collect()
  }
}

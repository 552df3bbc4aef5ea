package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRankInt: symmetric star ranks hub highest, leaves tie exactly") {
    // hub 0 ↔ leaves 1..4 (both directions — no dangling nodes)
    val edges = ((1L to 4L).map(l => (0L, l)) ++ (1L to 4L).map(l => (l, 0L)))
      .toDF("src", "dst")
    val got = GraphOps.pageRankInt(edges, "src", "dst", iters = 3)
      .orderBy($"rank".desc, $"node")
      .as[(Long, Long)].collect().toSeq
    assert(got.head._1 == 0L, s"hub not top-ranked: $got")
    val leafRanks = got.tail.map(_._2).toSet
    assert(leafRanks.size == 1, s"leaves must tie bit-exactly: $got")
    assert(got.head._2 > got(1)._2)
  }

  test("pageRankInt: partitioning-independent (exact integer equality)") {
    val edges = (for (i <- 0L until 30L) yield (i, (i * 7 + 1) % 30))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val r1 = GraphOps.pageRankInt(edges, "src", "dst", 3)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    val r2 = GraphOps.pageRankInt(edges.repartition(13), "src", "dst", 3)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(r1 == r2)
  }

  test("pageRankInt: mass is conserved up to floor-division leakage") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val total = GraphOps.pageRankInt(edges, "src", "dst", 2)
      .agg(org.apache.spark.sql.functions.sum($"rank"))
      .as[Long].head()
    val scale = 1000000000000L
    // each of 3 nodes can leak < 100 units/iter from the two floor divs
    assert(total <= scale && total > scale - 3 * 2 * 200,
      s"mass off: $total vs $scale")
  }
}

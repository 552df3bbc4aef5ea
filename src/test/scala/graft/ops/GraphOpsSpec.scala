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

  test("pageRankInt: broadcast and co-partitioned paths are bit-identical") {
    val edges = (for (i <- 0L until 20L) yield (i, (i * 3 + 1) % 20))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val bc = GraphOps.pageRankInt(edges, "src", "dst", 3,
        broadcastRanks = true)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    val part = GraphOps.pageRankInt(edges, "src", "dst", 3,
        broadcastRanks = false)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(bc == part)
  }

  test("cooccurrencePairs: support counting, orientation, dedup, basket cap") {
    val rows = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 2L), // duplicate (basket, item) row
      (12L, 2L), (12L, 3L),
      (13L, 1L), (13L, 2L),
      // 4-item basket: dropped entirely under maxBasket = 3
      (14L, 1L), (14L, 2L), (14L, 3L), (14L, 4L)
    ).toDF("b", "i")
    val got = GraphOps.cooccurrencePairs(rows, "b", "i",
        minSupport = 2L, maxBasket = 3)
      .orderBy($"item1", $"item2")
      .as[(Long, Long, Long)].collect().toSeq
    // (1,2): baskets 10, 11, 13 (dup row counted once; basket 14 capped)
    // (2,3): baskets 10, 12; (1,3): basket 10 only → pruned
    assert(got == Seq((1L, 2L, 3L), (2L, 3L, 2L)))
  }

  test("triangleCounts: one count per corner, shared edges don't double") {
    // triangles {1,2,3} and {2,3,4} share edge (2,3); (4,5) closes nothing
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = GraphOps.triangleCounts(e, "a", "b")
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("bfsDepths: minimum-hop labeling, frontier stops at maxDepth") {
    // path 1-2-3-4-5 plus shortcut 1-3: node 3 is depth 1 via the
    // shortcut (NOT depth 2 via node 2); 5 is beyond maxDepth = 3
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("s", "d")
    val got = GraphOps.bfsDepths(e, "s", "d", Seq(1L), maxDepth = 3)
      .orderBy($"node").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 0), (2L, 1), (3L, 1), (4L, 2), (5L, 3)))
  }

  test("bfsDepths: disconnected nodes never appear; early frontier drain") {
    val e = Seq((1L, 2L), (2L, 1L), (8L, 9L), (9L, 8L)).toDF("s", "d")
    // duplicated seed must not duplicate the depth-0 row
    val got = GraphOps.bfsDepths(e, "s", "d", Seq(1L, 1L), maxDepth = 5)
      .orderBy($"node").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 0), (2L, 1))) // frontier empties at depth 2
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

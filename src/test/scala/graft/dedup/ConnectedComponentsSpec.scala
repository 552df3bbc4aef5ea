package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Naive union-find ground truth: node → min id of its component. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** cutoff=0 forces the distributed large-star/small-star path;
    * the default exercises the driver union-find fast path. */
  private def ccMap(edges: Seq[(Long, Long)], cutoff: Long = 1L << 20): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("u", "v"), smallGraphCutoff = cutoff)
      .as[(Long, Long)].collect().toMap

  test("chain graph collapses to one component rooted at the min id") {
    val chain = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = ccMap(chain)
    assert(got == (1L to 9L).map(_ -> 1L).toMap)
    // distributed star-loop path agrees (diameter-8 chain is the case
    // where naive label propagation would need 8 rounds; stars need ~3)
    assert(ccMap(chain, cutoff = 0) == got)
  }

  test("multiple components, duplicate and self-loop edges tolerated") {
    val edges = Seq((10L, 20L), (20L, 30L), (5L, 7L), (7L, 5L), (42L, 42L),
      (10L, 20L))
    val got = ccMap(edges)
    assert(got.get(30L).contains(10L) && got.get(20L).contains(10L))
    assert(got.get(7L).contains(5L))
    // self-loop node is dropped from the edge list (callers union
    // singletons back via resolveClusters)
    assert(!got.contains(42L))
  }

  test("random graphs match union-find (seeded)") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      assert(ccMap(edges) == unionFind(edges), s"trial $trial: $edges")
      // the distributed path must give the identical answer
      if (trial == 1) assert(ccMap(edges, cutoff = 0) == unionFind(edges))
    }
  }

  test("resolveClusters: chained near-dups a~b, b~c keep exactly one doc") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (9L, "unrelated"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val resolved = Dedup.resolveClusters(docs, "doc_id", pairs)
    val keepers = resolved.filter($"is_keeper").select($"doc_id").as[Long]
      .collect().toSet
    assert(keepers == Set(1L, 9L)) // one per cluster + the singleton
    val clusters = resolved.select($"doc_id", $"cluster_id").as[(Long, Long)]
      .collect().toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("dropNearDups end-to-end: LSH pairs → clusters → min-id survivors") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val docs = Seq(
      (1L, base + " today"),
      (2L, base + " tonight"),   // near-dup of 1
      (3L, base + " this fine evening maybe"), // near-dup chain via 1/2
      (7L, "completely different content about catalyst optimizer rules and codegen stages"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept.contains(7L))
    assert(kept.contains(1L))
    assert(!kept.contains(2L)) // 2 is in 1's cluster
  }
}

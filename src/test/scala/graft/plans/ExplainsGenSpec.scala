package graft.plans

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

class ExplainsGenSpec extends AnyFunSuite {

  test("pin extraction finds the spec's literal planOf calls") {
    val src = Files.readString(
      Paths.get("src/test/scala/graft/plans/PlanAuditSpec.scala"))
    val pins = ExplainsGen.pinnedQueries(src).toMap
    assert(pins.size >= 20, s"suspiciously few pins: ${pins.size}")
    assert(pins.get("q1_agg").exists(_.contains("partial+final")))
    assert(pins.get("q74_lateral").exists(_.contains("LATERAL")))
    // the whole-inventory sweep pins a global property, not a query shape —
    // it must not be attributed to any query (it calls planOf(name), not a
    // literal, so the extractor cannot see it; this guards that invariant)
    assert(!pins.valuesIterator.exists(_.contains("no registered query")))
  }

  test("EXPLAINS.md is in sync with the pinned query set") {
    val src = Files.readString(
      Paths.get("src/test/scala/graft/plans/PlanAuditSpec.scala"))
    val pins = ExplainsGen.pinnedQueries(src).map(_._1).toSet
    val md = Files.readString(Paths.get("EXPLAINS.md"))
    val documented = "(?m)^## (q\\S+)$".r.findAllMatchIn(md).map(_.group(1)).toSet
    assert(documented == pins,
      s"EXPLAINS.md drifted — regenerate with `sbt \"Test/runMain graft.plans.ExplainsGen\"`; " +
        s"missing=${pins -- documented} stale=${documented -- pins}")
  }
}

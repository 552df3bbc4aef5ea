package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Constraints]]: every check type counts its planted violations
  * exactly, and all row-local checks compile into ONE aggregate over one
  * scan (the property that keeps a 30-check audit a single pass at
  * 100 TB).
  */
class ConstraintsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fact = Seq(
    // (key, line, value, flag, dt)
    (1L, 1, Option(5.0), "A", Option("2020-01-01")),
    (1L, 1, Option(200.0), "X", None),      // dup key; out of bounds; bad enum; null
    (2L, 1, Option.empty[Double], "N", Option("2020-01-02")), // null value → bounds
    (2L, 2, Option(10.0), "R", Option("2020-01-03")),
    (9L, 1, Option(10.0), "R", Option("2020-01-04"))          // orphan key
  ).toDF("k", "ln", "v", "flag", "dt")

  private def dim = Seq(1L, 2L, 3L).toDF("dk")

  import Constraints._

  test("each check counts its planted violations exactly") {
    val report = audit(fact, Seq(
      NotNull("dt"),
      Bounds("v", 0.0, 100.0),
      InSet("flag", Seq("A", "N", "R")),
      Unique(Seq("k", "ln")),
      RefIntegrity("k", dim, "dk")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(report == Map(
      "not_null:dt" -> ((1L, 5L, false)),
      "bounds:v" -> ((2L, 5L, false)),       // 200.0 out of range + null
      "in_set:flag" -> ((1L, 5L, false)),
      "unique:k,ln" -> ((1L, 5L, false)),    // (1,1) twice → 1 extra row
      "ref:k" -> ((1L, 5L, false))))         // k=9 not in dim
  }

  test("a clean table passes every check with zero violations") {
    val clean = Seq((1L, 1, 5.0, "A"), (2L, 1, 6.0, "N")).toDF("k", "ln", "v", "flag")
    val report = audit(clean, Seq(
      NotNull("v"), Bounds("v", 0.0, 100.0), Unique(Seq("k", "ln"))))
      .collect()
    assert(report.forall(_.getBoolean(3)), report.mkString("; "))
    assert(report.forall(_.getLong(1) == 0L))
  }

  test("all row-local checks share one aggregate (single-pass audit)") {
    val df = audit(fact, Seq(
      NotNull("dt"), Bounds("v", 0.0, 100.0), InSet("flag", Seq("A"))))
    val agg = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    // one violation-summing aggregate (3 sums + total in a single node)
    // plus the in-plan totals row — nothing per-check
    val sums = agg.map(_.aggregateExpressions.size).max
    assert(sums >= 4, s"checks did not fuse into one aggregate: $agg")
  }

  test("empty multi-row groups report zero, not an empty frame") {
    val clean = Seq((1L, 1), (2L, 1)).toDF("k", "ln")
    val report = audit(clean, Seq(Unique(Seq("k", "ln"))))
      .collect()
    assert(report.length == 1 && report.head.getLong(1) == 0L)
  }

  test("an empty check list fails loudly instead of an unreducible plan") {
    val e = intercept[IllegalArgumentException] {
      audit(Seq((1L, 1)).toDF("k", "ln"), Nil)
    }
    assert(e.getMessage.contains("at least one check"))
  }

  test("the table count is attached once, not once per multi-row check") {
    val t = Seq((1L, 1, "a"), (2L, 2, "b"), (2L, 3, "c")).toDF("k", "ln", "v")
    val dim = Seq(1, 2, 3).toDF("ln_dim")
    val report = audit(t, Seq(
      Unique(Seq("k")), Unique(Seq("v")), RefIntegrity("ln", dim, "ln_dim")))
    // three multi-row checks → exactly ONE extra count aggregate: the
    // plan holds 3 check scans + 1 shared totals scan of the table
    val p = report.queryExecution.optimizedPlan.toString()
    val scans = "LocalRelation".r.findAllIn(p).size
    assert(report.collect().length == 3)
    assert(scans <= 5, s"totals replanted per check ($scans source scans):\n$p")
  }
}

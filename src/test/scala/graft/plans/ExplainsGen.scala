package graft.plans

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Regenerates EXPLAINS.md from the queries PlanAuditSpec pins — the spec
  * source is the single source of truth for WHICH plans are documented,
  * so a prose dump can never drift from (or outlive) its machine-checked
  * assertion. Each section names the pinning test.
  *
  * Run from the repo root: `sbt "Test/runMain graft.plans.ExplainsGen"`.
  */
object ExplainsGen {

  private val SpecPath = "src/test/scala/graft/plans/PlanAuditSpec.scala"

  /** (query → pinning test name), from literal `planOf("q…")` calls inside
    * `test("…")` blocks. The whole-inventory sweep calls planOf through a
    * variable and is deliberately not matched — it pins a global property,
    * not one query's shape. */
  private[plans] def pinnedQueries(specSource: String): Seq[(String, String)] = {
    val testRe = """test\("([^"]+)"\)""".r
    val planRe = """planOf\("(q[0-9][^"]*)"\)""".r
    var current = ""
    val out = collection.mutable.LinkedHashMap[String, String]()
    specSource.linesIterator.foreach { line =>
      testRe.findFirstMatchIn(line).foreach(m => current = m.group(1))
      planRe.findAllMatchIn(line).foreach { m =>
        if (current.nonEmpty) out.getOrElseUpdate(m.group(1), current)
      }
    }
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spec = Files.readString(Paths.get(SpecPath))
    val pinned = pinnedQueries(spec)
      .sortBy { case (q, _) => q.drop(1).takeWhile(_.isDigit).toInt }
    require(pinned.nonEmpty, s"no planOf pins found in $SpecPath")

    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sections = pinned.map { case (q, testName) =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      graft.runtime.Lifetime.releaseAll(spark, blocking = false)
      s"""## $q
         |
         |Pinned by `PlanAuditSpec`: "$testName"
         |
         |```
         |${plan.trim}
         |```""".stripMargin
    }
    val header =
      s"""# EXPLAINS — formatted physical plans of the pinned queries ($sfDir)
         |
         |GENERATED — do not edit. Regenerate with
         |`sbt "Test/runMain graft.plans.ExplainsGen"`; the query list is
         |extracted from PlanAuditSpec's `planOf` pins, so every dump below
         |has a machine-checked assertion keeping its shape honest, and a
         |dump cannot exist without one.
         |""".stripMargin
    Files.write(Paths.get("EXPLAINS.md"),
      (header +: sections).mkString("\n", "\n\n", "\n").trim.concat("\n")
        .getBytes("UTF-8"))
    println(s"[explains] wrote ${pinned.size} sections to EXPLAINS.md")
    spark.stop()
  }
}

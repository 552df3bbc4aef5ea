package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plans.{ConstraintCatalog, MatViewCatalog}

/** [[Lake.open]]: a FRESH session's first open of a commit-log table
  * auto-restores the view and constraint registrations persisted on its
  * log — a q155-shaped aggregate then routes to the materialized view
  * with no explicit `restore` call anywhere.
  */
class LakeOpenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scanDirs(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.map(p =>
            ConstraintCatalog.normalize(p.toString)
              .reverse.dropWhile(_ != '/').drop(1).reverse)
        case _ => Nil
      }
    }.flatten.toSet

  test("fresh session + Lake.open routes a base aggregate to the view") {
    val work = java.nio.file.Files.createTempDirectory("graft_open_").toString
    val base = s"$work/base"
    spark.range(0, 80).select(
        col("id").as("k"), (col("id") % 4).cast("int").as("p"),
        (col("id") * 3).as("v"))
      .write.partitionBy("p").parquet(base)
    CommitLog.init(spark, base)
    val d = IncrementalView.Definition(
      base, s"$work/view", "p", Seq("p"),
      Seq(count(lit(1)).as("cnt"), sum("v").as("sum_v")))
    // publish-time: definition persisted INTO the base table's log
    MatViewCatalog.persist(spark, d)
    IncrementalView.refresh(spark, d)

    // ---- simulate a fresh session: JVM-global registries emptied
    MatViewCatalog.clear()
    ConstraintCatalog.clear()
    Lake.refresh(base)

    def agg(df: DataFrame): DataFrame =
      df.groupBy("p").agg(count(lit(1)).as("n"), sum("v").as("sv"))

    // without open: no registration, the aggregate scans the base
    assert(scanDirs(agg(CommitLog.read(spark, base)))
      .forall(_.startsWith(ConstraintCatalog.normalize(base))))

    // with open: the log-resident registration restores and the SAME
    // query routes to the view — no explicit restore call anywhere
    val routed = agg(Lake.open(spark, base))
    val dirs = scanDirs(routed)
    assert(dirs.nonEmpty && dirs.forall(
      _.startsWith(ConstraintCatalog.normalize(s"$work/view"))),
      s"expected view-only scan, got $dirs")
    // and the values are the base truth
    val expect = agg(CommitLog.read(spark, base)).collect()
      .map(_.toString).sorted.toSeq
    MatViewCatalog.clear() // value check un-rewritten
    val truth = agg(CommitLog.read(spark, base)).collect()
      .map(_.toString).sorted.toSeq
    assert(expect == truth)
  }

  test("open restores audited constraint declarations too") {
    val work = java.nio.file.Files.createTempDirectory("graft_open2_").toString
    val fact = s"$work/fact"
    val dim = s"$work/dim"
    spark.range(0, 50).select(col("id").as("fk"), lit("x").as("pd"))
      .write.partitionBy("pd").parquet(fact)
    spark.range(0, 60).select(col("id").as("pk"), lit("d").as("name"))
      .write.parquet(dim)
    CommitLog.init(spark, fact)
    assert(ConstraintCatalog.declareAuditedLogged(spark, fact, "fk", dim, "pk"))

    ConstraintCatalog.clear()
    Lake.refresh(fact)
    assert(!ConstraintCatalog.isUnique(dim, "pk"))
    Lake.open(spark, fact)
    assert(ConstraintCatalog.isUnique(dim, "pk"),
      "unique declaration did not restore")
    assert(ConstraintCatalog.isForeignKey(fact, "fk", dim, "pk"),
      "fk declaration did not restore")
  }
}

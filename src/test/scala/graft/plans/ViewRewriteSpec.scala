package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.{CommitLog, IncrementalView}

/** [[RewriteAggregateOnView]]: aggregates over a commit-log base table
  * are transparently answered from a registered fresh [[IncrementalView]]
  * — and every soundness gate declines the rewrite rather than risking a
  * wrong answer. Each rewritten query is checked for BOTH plan routing
  * (the scan reads view files, not base files) and value equality with
  * the un-rewritten computation.
  */
class ViewRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_viewrw_").toString

  /** Directories (normalized) of every parquet scan in the optimized plan. */
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

  private def readsOnly(df: DataFrame, dir: String): Boolean = {
    val dirs = scanDirs(df)
    dirs.nonEmpty && dirs.forall(d =>
      d == ConstraintCatalog.normalize(dir) ||
        d.startsWith(ConstraintCatalog.normalize(dir) + "/"))
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private case class Fixture(base: String, view: String,
      d: IncrementalView.Definition)

  /** base: 100 rows, 4 partitions p∈0..3, v = k*10 (long), w = k%7
    * (long). View groups by p with the full derivable spec set. */
  private def fixture(): Fixture = {
    val work = tmp()
    val base = s"$work/base"
    spark.range(0, 100).select(
        col("id").as("k"), (col("id") % 4).cast("int").as("p"),
        (col("id") * 10).as("v"),
        when(col("id") % 5 === 0, lit(null)).otherwise(col("id") % 7).as("w"))
      .repartition(2)
      .write.partitionBy("p").parquet(base)
    CommitLog.init(spark, base)
    val d = IncrementalView.Definition(
      base, s"$work/view", "p", Seq("p"),
      Seq(count(lit(1)).as("cnt"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"),
        count(col("w")).as("cnt_w"), sum("w").as("sum_w")))
    IncrementalView.refresh(spark, d)
    Fixture(base, s"$work/view", d)
  }

  private def baseAgg(f: Fixture): DataFrame =
    CommitLog.read(spark, f.base).groupBy("p").agg(
      count(lit(1)).as("n"), sum("v").as("sv"),
      min("v").as("mn"), max("v").as("mx"))

  test("same-grouping aggregate is answered from the view, values identical") {
    val f = fixture()
    MatViewCatalog.clear()
    val expected = rows(baseAgg(f)) // un-rewritten: registry is empty
    assert(readsOnly(baseAgg(f), f.base))

    MatViewCatalog.register(f.d)
    try {
      val rewritten = baseAgg(f)
      assert(readsOnly(rewritten, f.view),
        s"expected view-only scan, got ${scanDirs(rewritten)}")
      assert(rows(rewritten) === expected)
    } finally MatViewCatalog.clear()
  }

  test("count(NULL) never rewrites to count(*): it stays 0, not group sizes") {
    val f = fixture()
    def q: DataFrame = CommitLog.read(spark, f.base)
      .groupBy("p").agg(count(lit(null)).as("n"))
    MatViewCatalog.clear()
    val expected = rows(q) // all zeros, unrewritten
    assert(expected.forall(_.endsWith(",0]")), s"fixture: $expected")
    MatViewCatalog.register(f.d)
    try {
      assert(rows(q) === expected,
        "count(NULL) was derived from the view's count(*) column")
    } finally MatViewCatalog.clear()
  }

  test("rollup to a coarser (global) grouping re-aggregates the view; count/avg derive correctly over nulls") {
    val f = fixture()
    def q: DataFrame = CommitLog.read(spark, f.base).agg(
      count(lit(1)).as("n"), count(col("w")).as("nw"),
      sum(col("v")).as("sv"), avg(col("w")).as("aw"))
    MatViewCatalog.clear()
    val expected = rows(q)
    MatViewCatalog.register(f.d)
    try {
      assert(readsOnly(q, f.view))
      assert(rows(q) === expected)
    } finally MatViewCatalog.clear()
  }

  test("filter on a grouping column selects whole groups and rides the rewrite; sort above survives exprId-preserving rewrite") {
    val f = fixture()
    def q: DataFrame = CommitLog.read(spark, f.base)
      .filter(col("p") =!= 1)
      .groupBy("p").agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .orderBy(desc("sv"))
    MatViewCatalog.clear()
    val expected = q.collect().map(_.toString).toSeq // order-sensitive
    MatViewCatalog.register(f.d)
    try {
      assert(readsOnly(q, f.view))
      assert(q.collect().map(_.toString).toSeq === expected)
    } finally MatViewCatalog.clear()
  }

  test("guards: stale view, non-group filter, distinct agg, and time travel all decline the rewrite (and stay correct)") {
    val f = fixture()
    MatViewCatalog.register(f.d)
    try {
      // non-group filter references v → whole-group selection unprovable
      val nonGroup = CommitLog.read(spark, f.base)
        .filter(col("v") > 100).groupBy("p").agg(sum("v").as("sv"))
      assert(readsOnly(nonGroup, f.base))

      // distinct aggregate is not derivable from the view's partials
      val distinctAgg = CommitLog.read(spark, f.base)
        .groupBy("p").agg(countDistinct(col("v")).as("dv"))
      assert(readsOnly(distinctAgg, f.base))

      // an aggregate the view does not carry (sum of a different column)
      val missing = CommitLog.read(spark, f.base)
        .groupBy("p").agg(sum(col("k")).as("sk"))
      assert(readsOnly(missing, f.base))

      // base moves ahead of the view → stale view must NOT answer
      val v1 = CommitLog.latest(spark, f.base).get.version
      CommitLog.upsert(spark,
        CommitLog.read(spark, f.base).filter(col("k") < 8)
          .withColumn("v", col("v") + 1), f.base, Seq("k"), "p")
      val stale = baseAgg(f)
      assert(readsOnly(stale, f.base))
      val expectedAfter = rows(stale)

      // time travel to the OLD snapshot: file set ≠ latest → no rewrite
      val old = CommitLog.readAt(spark, f.base, v1)
        .groupBy("p").agg(sum("v").as("sv"), count(lit(1)).as("n"))
      assert(readsOnly(old, f.base))

      // refresh → fresh again → rewrite resumes, landing on post-upsert
      IncrementalView.refresh(spark, f.d)
      val again = baseAgg(f)
      assert(readsOnly(again, f.view))
      assert(rows(again) === expectedAfter)
    } finally MatViewCatalog.clear()
  }

  test("two rollups on one base: the coarsest covering view answers; finer grouping falls through to the finer view") {
    val f = fixture() // view grouped by p
    // second, FINER view over the same base, grouped by (p, w)
    val fine = IncrementalView.Definition(
      f.base, f.base.stripSuffix("base") + "view_fine", "p", Seq("p", "w"),
      Seq(count(lit(1)).as("cnt"), sum("v").as("sum_v")))
    IncrementalView.refresh(spark, fine)
    MatViewCatalog.clear()
    def byP: DataFrame = CommitLog.read(spark, f.base)
      .groupBy("p").agg(sum("v").as("sv"))
    def byPW: DataFrame = CommitLog.read(spark, f.base)
      .groupBy("p", "w").agg(sum("v").as("sv"), count(lit(1)).as("n"))
    val expP = rows(byP)
    val expPW = rows(byPW)
    MatViewCatalog.register(f.d)
    MatViewCatalog.register(fine)
    try {
      // group by p: BOTH views cover; the coarse one (fewer rows) wins
      assert(readsOnly(byP, f.view))
      assert(rows(byP) === expP)
      // group by (p, w): only the finer view covers — falls through
      assert(readsOnly(byPW, fine.viewDir))
      assert(rows(byPW) === expPW)
    } finally MatViewCatalog.clear()
  }

  test("a spark.sql text query over a temp view of the base table is rewritten too") {
    val f = fixture()
    MatViewCatalog.clear()
    CommitLog.read(spark, f.base).createOrReplaceTempView("vr_base")
    def q: DataFrame = spark.sql(
      """SELECT p, count(*) AS n, sum(v) AS sv, max(v) AS mx
        |FROM vr_base WHERE p <> 2 GROUP BY p""".stripMargin)
    val expected = rows(q)
    MatViewCatalog.register(f.d)
    try {
      // EliminateSubqueryAliases strips the temp-view alias before the
      // operator-optimization fixed point, so the rule sees the same
      // Aggregate-over-relation shape as the DataFrame path
      assert(readsOnly(q, f.view), s"SQL path not routed: ${scanDirs(q)}")
      assert(rows(q) === expected)
    } finally {
      MatViewCatalog.clear()
      spark.catalog.dropTempView("vr_base")
    }
  }

  test("rule composition: the RI dim join is eliminated, then the view answers the surviving aggregate — neither dim nor base scanned") {
    val f = fixture()
    val dimDir = tmp() + "/dim"
    spark.range(0, 4).select(col("id").cast("int").as("dp"),
      concat(lit("name"), col("id")).as("dname")).write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    def q: DataFrame = CommitLog.read(spark, f.base)
      .join(dim, col("p") === col("dp"))
      .groupBy("p").agg(sum("v").as("sv"), count(lit(1)).as("n"))
    ConstraintCatalog.clear(); MatViewCatalog.clear()
    val expected = rows(q) // plain join + aggregate
    // declare RI on the COMMIT-LOG fact (its scan lists files, not a
    // directory — coveringDeclared maps it back) and register the view
    ConstraintCatalog.declareUnique(dimDir, "dp")
    ConstraintCatalog.declareForeignKey(f.base, "p", dimDir, "dp")
    MatViewCatalog.register(f.d)
    try {
      val dirs = scanDirs(q)
      assert(readsOnly(q, f.view),
        s"composition did not land on the view: $dirs")
      assert(rows(q) === expected)
    } finally { ConstraintCatalog.clear(); MatViewCatalog.clear() }
  }

  test("catalog state rides the log: a fresh session restores persisted views + constraints and both rewrites fire") {
    val f = fixture()
    val dimDir = tmp() + "/dim"
    spark.range(0, 4).select(col("id").cast("int").as("dp"),
      concat(lit("d"), col("id")).as("dname")).write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    def q: DataFrame = CommitLog.read(spark, f.base)
      .join(dim, col("p") === col("dp"))
      .groupBy("p").agg(sum("v").as("sv"), count(lit(1)).as("n"))
    ConstraintCatalog.clear(); MatViewCatalog.clear()
    val expected = rows(q)
    try {
      // persist both into the base table's log (audited RI; props-only
      // commits — the view needs NO re-refresh to stay serving-fresh)
      MatViewCatalog.persist(spark, f.d)
      assert(ConstraintCatalog.declareAuditedLogged(
        spark, f.base, "p", dimDir, "dp"))

      // "restart": both JVM registries gone → no rewrites (the plan
      // still scans the base lake and joins the dim)
      ConstraintCatalog.clear(); MatViewCatalog.clear()
      assert(!readsOnly(q, f.view))

      // a fresh session restores from the table itself
      assert(MatViewCatalog.restore(spark, f.base).size === 1)
      assert(ConstraintCatalog.restore(spark, f.base) === 1)
      assert(readsOnly(q, f.view),
        s"restored catalogs did not re-enable the composition: ${scanDirs(q)}")
      assert(rows(q) === expected)
    } finally { ConstraintCatalog.clear(); MatViewCatalog.clear() }
  }

  test("registration rejects non-derivable view aggregates") {
    val f = fixture()
    intercept[IllegalArgumentException] {
      MatViewCatalog.register(IncrementalView.Definition(
        f.base, f.view + "2", "p", Seq("p"),
        Seq(sum(col("v") * 2).as("weird"))))
    }
  }
}

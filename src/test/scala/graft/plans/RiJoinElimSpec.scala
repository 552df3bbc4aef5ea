package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[EliminateRiDimJoin]]: a declared-unique, declared-referenced
  * dimension join whose only surviving column is the join key must vanish
  * from the optimized plan, and the join-free result must equal what the
  * join produces (asserted by re-running with the rule excluded). Every
  * soundness gate gets a negative case: undeclared pair, extra dim column
  * referenced, extra dim-side filter, computed fk.
  */
class RiJoinElimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // fact: fk ∈ dim.pk ∪ {null} (RI holds); dim: pk unique, one extra col
  private lazy val dir: String = {
    val work = java.nio.file.Files.createTempDirectory("graft_rijoin_").toString
    Seq((10L, "a"), (20L, "b"), (30L, "c"))
      .toDF("pk", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$work/dim.parquet")
    Seq((1L, Some(10L), 5.0), (2L, Some(10L), 7.0), (3L, Some(20L), 1.0),
        (4L, None, 9.0), (5L, Some(30L), 2.0))
      .toDF("id", "fk", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$work/fact.parquet")
    // ri-violating fact: fk=99 has no dim row
    Seq((1L, Some(10L), 1.0), (2L, Some(99L), 1.0))
      .toDF("id", "fk", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$work/badfact.parquet")
    work
  }
  // vals, not defs: each read creates fresh attribute ids, and
  // `fact("fk")` must resolve against the same instance that is joined
  private lazy val dim = spark.read.parquet(s"$dir/dim.parquet")
  private lazy val fact = spark.read.parquet(s"$dir/fact.parquet")

  private def declare(): Unit = {
    ConstraintCatalog.clear()
    ConstraintCatalog.declareUnique(s"$dir/dim.parquet", "pk")
    ConstraintCatalog.declareForeignKey(
      s"$dir/fact.parquet", "fk", s"$dir/dim.parquet", "pk")
  }

  private def joins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.size

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Ground truth: the same query with the elimination rule disabled. */
  private def baselineRows(build: => DataFrame): Seq[String] = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, EliminateRiDimJoin.ruleName)
    try {
      val df = build
      assert(joins(df) > 0,
        "baseline lost its Join — excludedRules did not disable the rule")
      rows(df)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def innerAgg: DataFrame =
    fact.join(dim, fact("fk") === dim("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      .orderBy("pk")

  test("inner join to a declared dim folds to a null-filter, same rows") {
    declare()
    val df = innerAgg
    assert(joins(df) === 0, df.queryExecution.optimizedPlan.toString)
    assert(rows(df) === baselineRows(innerAgg))
    // the null-fk row must be gone (inner-join semantics)
    assert(df.agg(sum("cnt")).as[Long].head === 4L)
  }

  test("output schema and column names survive the pk→fk substitution") {
    declare()
    assert(innerAgg.columns.toSeq === Seq("pk", "cnt", "sv"))
    assert(innerAgg.schema("pk").dataType.typeName === "long")
  }

  test("left outer join folds without the null filter, nulls preserved") {
    declare()
    def q = fact.join(dim, fact("fk") === dim("pk"), "left_outer")
      .select(col("id"), col("pk")).orderBy("id")
    assert(joins(q) === 0)
    assert(rows(q) === baselineRows(q))
    // the fk-null fact row survives with a null pk, as the real join pads
    assert(q.filter(col("pk").isNull).count() === 1L)
  }

  test("left semi join folds to IsNotNull(fk)") {
    declare()
    def q = fact.join(dim, fact("fk") === dim("pk"), "left_semi")
      .select("id").orderBy("id")
    assert(joins(q) === 0)
    assert(rows(q) === baselineRows(q))
    assert(q.count() === 4L)
  }

  test("undeclared pair is left alone") {
    ConstraintCatalog.clear()
    assert(joins(innerAgg) === 1)
  }

  test("referencing a non-key dim column blocks elimination") {
    declare()
    val q = fact.join(dim, fact("fk") === dim("pk"))
      .groupBy(col("label")).agg(count(lit(1)).as("cnt"))
    assert(joins(q) === 1)
  }

  test("an extra dim-side filter blocks elimination") {
    declare()
    val q = fact.join(dim.filter(col("label") =!= "b"),
        fact("fk") === dim("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
    assert(joins(q) === 1)
  }

  test("a computed fk blocks elimination (provenance requires a bare scan column)") {
    declare()
    val f2 = fact.withColumn("fk2", col("fk") + 0L)
    val q = f2.join(dim, f2("fk2") === dim("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
    assert(joins(q) === 1)
  }

  test("declareAudited verifies before trusting: accepts RI-true, rejects RI-false") {
    ConstraintCatalog.clear()
    assert(ConstraintCatalog.declareAudited(spark,
      s"$dir/fact.parquet", "fk", s"$dir/dim.parquet", "pk"))
    assert(ConstraintCatalog.isUnique(s"$dir/dim.parquet", "pk"))
    ConstraintCatalog.clear()
    assert(!ConstraintCatalog.declareAudited(spark,
      s"$dir/badfact.parquet", "fk", s"$dir/dim.parquet", "pk"))
    assert(!ConstraintCatalog.isUnique(s"$dir/dim.parquet", "pk"))
  }

  test("path normalization: scheme-prefixed and trailing-slash declarations match") {
    ConstraintCatalog.clear()
    ConstraintCatalog.declareUnique(s"file:$dir/dim.parquet/", "pk")
    ConstraintCatalog.declareForeignKey(
      s"file:$dir/fact.parquet", "fk", s"$dir/dim.parquet", "pk")
    assert(joins(innerAgg) === 0)
  }

  test("a UNION on the fact side blocks elimination (branches inject " +
      "fk values the declared scan never held)") {
    declare()
    // the union reuses the head child's exprIds, so a provenance walk
    // that only matched by exprId would trace fk to the DECLARED scan
    // and wave the injected fk=99 row (no dim match) through
    val injected = Seq((9L, Some(99L), 1.0)).toDF("id", "fk", "v")
    val q = fact.union(injected)
      .join(dim, col("fk") === col("pk"))
      .select(col("id"), col("pk"))
    assert(joins(q) === 1, "union fact side must keep the join")
    // and the values are the true join's: the injected row is dropped
    assert(rows(q) == baselineRows(
      fact.union(injected).join(dim, col("fk") === col("pk"))
        .select(col("id"), col("pk"))))
    assert(!rows(q).exists(_.contains("9,")), "fk=99 row survived")
  }
}

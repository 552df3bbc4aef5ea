package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[IncrementalView]]: after any sequence of base upserts/deletes, an
  * incremental refresh must land the view on EXACTLY the from-scratch
  * aggregate of the current base — while recomputing only the touched
  * partitions. Covers bootstrap, single-partition refresh, non-invertible
  * aggregates (min under value-raising updates), delete propagation
  * (including a fully-emptied partition), idempotent re-refresh, and the
  * vacuumed-history full-refresh fallback.
  */
class IncrementalViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_incrview_").toString

  private def seed(dir: String): Unit = {
    // 4 partitions × 25 keys
    spark.range(0, 100).select(
        col("id").as("k"), (col("id") % 4).cast("int").as("p"),
        (col("id") * 10).as("v"))
      .repartition(2)
      .write.partitionBy("p").parquet(dir)
    CommitLog.init(spark, dir)
  }

  private def defOf(base: String, view: String) = IncrementalView.Definition(
    base, view, "p", Seq("p"),
    Seq(count(lit(1)).as("n"), sum("v").as("sv"), min("v").as("mn")))

  private def direct(base: String): Seq[String] =
    CommitLog.read(spark, base).groupBy("p")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"), min("v").as("mn"))
      .collect().map(_.toString).sorted.toSeq

  private def viewRows(d: IncrementalView.Definition): Seq[String] =
    IncrementalView.read(spark, d).select("p", "n", "sv", "mn")
      .collect().map(_.toString).sorted.toSeq

  test("invertible delta refresh: non-partition-aligned grouping stays exact through upserts, deletes, and emptied groups") {
    val work = tmp()
    val base = s"$work/base"
    // 4 date partitions; grouping column `flag` CROSSES partitions
    // (flag = k%3), plus a flag "z" that lives only in p=2 so a delete
    // can empty an entire group; v null every 5th key exercises the
    // null-ignoring sum/count(v) delta
    spark.range(0, 100).select(
        col("id").as("k"), (col("id") % 4).cast("int").as("p"),
        when(col("id") === 2 || col("id") === 6, lit("z"))
          .otherwise(concat(lit("f"), col("id") % 3)).as("flag"),
        when(col("id") % 5 === 0, lit(null)).otherwise(col("id") * 10).as("v"))
      .repartition(2)
      .write.partitionBy("p").parquet(base)
    CommitLog.init(spark, base)
    val d = IncrementalView.Definition(
      base, s"$work/view", "p", Seq("flag"),
      Seq(count(lit(1)).as("n"), sum("v").as("sv"), count(col("v")).as("nv")),
      invertible = true)
    def direct: Seq[String] =
      CommitLog.read(spark, base).groupBy("flag")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"),
          count(col("v")).as("nv"))
        .collect().map(_.toString).sorted.toSeq
    def view: Seq[String] =
      IncrementalView.read(spark, d).select("flag", "n", "sv", "nv")
        .collect().map(_.toString).sorted.toSeq

    assert(IncrementalView.refresh(spark, d) === Seq("*")) // bootstrap
    assert(view === direct)

    // upsert touching ONLY p=1: raised values, new keys, nulls flipped
    val ups = spark.range(0, 120)
      .filter(col("id") % 4 === 1)
      .select(col("id").as("k"), lit(1).cast("int").as("p"),
        concat(lit("f"), col("id") % 3).as("flag"),
        when(col("id") % 7 === 0, lit(null)).otherwise(col("id") * 11).as("v"))
    CommitLog.upsert(spark, ups, base, Seq("k"), "p")
    assert(IncrementalView.refresh(spark, d) === Seq("p=1"))
    assert(view === direct)

    // delete empties group "z" (its rows all live in p=2)
    CommitLog.delete(spark, base, col("flag") === "z")
    assert(IncrementalView.refresh(spark, d) === Seq("p=2"))
    assert(view === direct)
    assert(!view.exists(_.contains("z")), "emptied group must drop")

    // fresh → no-op; replayed refresh is a ledger no-op
    assert(IncrementalView.refresh(spark, d).isEmpty)

    // vacuumed pre-image → loud FULL fallback, still exact
    CommitLog.upsert(spark,
      ups.withColumn("v", col("v") + 1), base, Seq("k"), "p")
    CommitLog.vacuum(spark, base, keepLast = 1)
    assert(IncrementalView.refresh(spark, d) === Seq("*"))
    assert(view === direct)
  }

  test("vacuumed-history fallback also replaces view partitions whose " +
      "base rows vanished inside the gap") {
    val work = tmp()
    val base = s"$work/base"
    val view = s"$work/view"
    seed(base)
    val d = defOf(base, view)
    IncrementalView.refresh(spark, d) // bootstrap: groups 0..3
    assert(viewRows(d).exists(_.startsWith("[3,")))
    // inside the soon-vacuumed gap: partition 3 empties entirely
    CommitLog.delete(spark, base, col("p") === 3)
    CommitLog.vacuum(spark, base, keepLast = 1, staleStagingMs = 0L)
    // fallback cannot see WHICH partitions changed; it must still cover
    // the view-only partition 3 or its stale group would serve forever
    val touched = IncrementalView.refresh(spark, d)
    assert(touched.contains("3"),
      s"fallback must include the emptied partition, got $touched")
    assert(viewRows(d) === direct(base))
    assert(!viewRows(d).exists(_.startsWith("[3,")),
      "the emptied partition's stale group survived the fallback")
  }

  test("invertible definitions reject non-invertible aggregates") {
    intercept[IllegalArgumentException] {
      IncrementalView.Definition("/b", "/v", "p", Seq("flag"),
        Seq(count(lit(1)).as("n"), min("v").as("mn")), invertible = true)
    }
    intercept[IllegalArgumentException] { // no count(*) → emptied groups undetectable
      IncrementalView.Definition("/b", "/v", "p", Seq("flag"),
        Seq(sum("v").as("sv")), invertible = true)
    }
  }

  test("bootstrap, targeted refresh, deletes, idempotence, vacuum fallback — view ≡ direct aggregate throughout") {
    val work = tmp()
    val base = s"$work/base"
    val view = s"$work/view"
    seed(base)
    val d = defOf(base, view)

    // bootstrap = full build
    assert(IncrementalView.refresh(spark, d) === Seq("*"))
    assert(viewRows(d) === direct(base))

    // upsert touching ONLY partition 2 (k ≡ 2 mod 4, raising v so the
    // min is NON-invertible state: delta subtraction could never get
    // this right, recompute must)
    CommitLog.upsert(spark,
      Seq((2L, 2, 99999L), (6L, 2, -5L)).toDF("k", "p", "v")
        .withColumn("p", col("p").cast("int")),
      base, Seq("k"), "p")
    val touched = IncrementalView.refresh(spark, d)
    assert(touched === Seq("2"), s"expected only partition 2, got $touched")
    assert(viewRows(d) === direct(base))

    // already fresh → no-op
    assert(IncrementalView.refresh(spark, d) === Nil)

    // delete part of partition 1, ALL of partition 3: groups shrink and
    // the emptied partition's group disappears from the view
    CommitLog.delete(spark, base, col("p") === 1 && col("k") < 50L)
    CommitLog.delete(spark, base, col("p") === 3)
    val touched2 = IncrementalView.refresh(spark, d)
    assert(touched2.toSet === Set("1", "3"))
    assert(viewRows(d) === direct(base))
    assert(!viewRows(d).exists(_.startsWith("[3,")), "emptied partition's group survived")

    // vacuum the base history out from under the ledger → loud full
    // refresh, still exact
    CommitLog.upsert(spark,
      Seq((0L, 0, 7L)).toDF("k", "p", "v").withColumn("p", col("p").cast("int")),
      base, Seq("k"), "p")
    CommitLog.vacuum(spark, base, keepLast = 1)
    val touched3 = IncrementalView.refresh(spark, d)
    assert(touched3.nonEmpty)
    assert(viewRows(d) === direct(base))

    // the view is itself a commit-log table: refresh history is time travel
    val versions = (1L to CommitLog.latest(spark, view).get.version)
    assert(versions.size >= 4)
  }

  test("a merge-on-read delete on the base refreshes the view — no stale rollup behind an empty file diff") {
    val work = tmp()
    val base = s"$work/base"
    val view = s"$work/view"
    seed(base)
    val d = defOf(base, view)
    IncrementalView.refresh(spark, d)
    assert(viewRows(d) == direct(base))
    // the MoR delete changes NO files — partsBetween must still surface
    // its touched partitions so the refresh recomputes them; without
    // that, the view (and the transparent rewrite behind it) would keep
    // serving tombstoned rows while claiming freshness
    CommitLog.deleteVectors(spark, base, col("k") < 50)
    val touched = IncrementalView.refresh(spark, d)
    assert(touched.nonEmpty, "MoR delete must mark partitions for refresh")
    assert(viewRows(d) == direct(base))
    assert(IncrementalView.read(spark, d)
      .agg(sum("n")).head.getLong(0) == 50L)
  }

  test("definition requires group locality (partitionCol in groupCols)") {
    intercept[IllegalArgumentException] {
      IncrementalView.Definition("b", "v", "p", Seq("k"), Seq(count(lit(1)).as("n")))
    }
  }
}

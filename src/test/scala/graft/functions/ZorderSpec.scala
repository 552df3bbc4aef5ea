package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.CommitLog

/** [[NativeZorder]] + [[CommitLog.compactZordered]]: the per-dimension
  * encodings must be order-preserving, the interleaved key must cluster
  * BOTH columns (zone maps prune either predicate), and the rewrite
  * must preserve every row. The lexicographic [[CommitLog
  * .compactClustered]] is the contrast case: sharp on the leading
  * column, near-useless on the trailing one.
  */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-dimension encodings are order-preserving") {
    val longs = Seq(Long.MinValue, -5L, -1L, 0L, 1L, 42L, Long.MaxValue)
    assert(longs.map(NativeZorder.encodeLong) ==
      longs.map(NativeZorder.encodeLong).sorted(
        Ordering.fromLessThan[Long](java.lang.Long.compareUnsigned(_, _) < 0)))
    val doubles = Seq(Double.NegativeInfinity, -1e18, -2.5, -0.0, 0.0,
      1e-300, 3.25, Double.PositiveInfinity)
    val encD = doubles.map(NativeZorder.encodeDouble)
    assert(encD == encD.sorted(
      Ordering.fromLessThan[Long](java.lang.Long.compareUnsigned(_, _) < 0)))
    val strs = Seq("", "a", "ab", "abc", "b", "zz")
    val encS = strs.map(s => NativeZorder.encodeUtf8(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(encS == encS.sorted(
      Ordering.fromLessThan[Long](java.lang.Long.compareUnsigned(_, _) < 0)))
  }

  test("SQL graft_zorder ≡ Column API, inside codegen") {
    val df = spark.range(0, 1000)
      .select($"id".as("a"), (($"id" * 7919) % 311).as("b"))
    df.createOrReplaceTempView("zsrc")
    val viaSql = spark.sql(
      "SELECT hex(graft_zorder(a, b)) AS z FROM zsrc ORDER BY a")
      .as[String].collect().toSeq
    val viaApi = df.select(hex(NativeZorder.zorder($"a", $"b")).as("z"))
      .orderBy($"a").as[String].collect().toSeq
    assert(viaSql == viaApi)
    assert(viaSql.distinct.size == viaSql.size, "keys must disperse")
  }

  test("z-ordered rewrite prunes BOTH columns; lexicographic prunes " +
    "only the leading; rows preserved bit for bit") {
    val dir = Files.createTempDirectory("graft_zorder_").toString + "/lake"
    // two independent uniform dimensions (power-of-two ranges keep the
    // Z cells square — the geometry the pruning bound assumes)
    spark.range(0, 100000)
      .select($"id".as("k"), ($"id" % 256).as("a"),
        (($"id" * 7919) % 256).as("b"))
      .repartition(16)
      .write.parquet(dir)
    CommitLog.init(spark, dir, statsCols = Seq("a", "b"))
    val before = CommitLog.read(spark, dir)
      .agg(count(lit(1)), sum($"k"), sum($"a" * $"b")).collect().toSeq

    CommitLog.compactClustered(spark, dir, 16, Seq("a", "b"))
    val (_, (lexA, totalA)) = CommitLog.scanRange(spark, dir, "a", 100, 119)
    val (_, (lexB, totalB)) = CommitLog.scanRange(spark, dir, "b", 100, 119)
    assert(lexA * 4 <= totalA, "lexicographic must prune the leading col")
    assert(lexB * 2 > totalB,
      "lexicographic should NOT prune the trailing col (the contrast)")

    CommitLog.compactZordered(spark, dir, 16, Seq("a", "b"))
    val (dfA, (zA, ztotA)) = CommitLog.scanRange(spark, dir, "a", 100, 119)
    val (dfB, (zB, ztotB)) = CommitLog.scanRange(spark, dir, "b", 100, 119)
    assert(zA * 2 <= ztotA, s"z-order must prune col a: $zA/$ztotA")
    assert(zB * 2 <= ztotB, s"z-order must prune col b: $zB/$ztotB")
    // pruned scans return exactly the predicate's rows
    assert(dfA.count() ==
      (0L until 100000L).count(i => { val a = i % 256; a >= 100 && a <= 119 }))
    assert(dfB.count() ==
      (0L until 100000L).count(i => { val b = (i * 7919) % 256; b >= 100 && b <= 119 }))
    // row preservation through the z rewrite
    assert(CommitLog.read(spark, dir)
      .agg(count(lit(1)), sum($"k"), sum($"a" * $"b")).collect().toSeq ==
      before)

    // the SQL verb lands the same rewrite
    val out = spark.sql(s"CALL graft_compact_zorder('$dir', 8, 'a', 'b')")
      .collect()
    assert(out.head.getString(1) == "compact-zorder")
    assert(CommitLog.read(spark, dir).count() == 100000L)
  }

  test("a data column literally named __z survives the z rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zc_")
      .toString + "/lake"
    spark.range(0, 1000)
      .select($"id".as("a"), ($"id" % 7).as("b"), ($"id" * 3).as("__z"))
      .write.parquet(dir)
    CommitLog.init(spark, dir, statsCols = Seq("a", "b"))
    CommitLog.compactZordered(spark, dir, 4, Seq("a", "b"))
    val got = CommitLog.read(spark, dir).select($"a", $"__z")
      .as[(Long, Long)].collect().toSet
    assert(got == (0L until 1000L).map(i => (i, i * 3)).toSet,
      "the user's __z column must not be clobbered by the staging key")
  }
}

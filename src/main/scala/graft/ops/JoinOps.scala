package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark lacks as single operators, built scalably from
  * relational primitives.
  */
object JoinOps {

  /** Backward as-of join: for every left row, attach the value columns of
    * the latest right row with `right(tsCol) <= left(tsCol)` within the
    * same `keyCols` group (inclusive). Nulls when no prior right row.
    *
    * Implementation: union both sides tagged, one sort per key, carry the
    * last-seen right values forward — one shuffle, O(n log n) per key,
    * never the O(n·m) inequality join. Right-side ties at identical ts:
    * right rows sort before left rows, so the match is inclusive; among
    * multiple right rows at the same ts the last in (ts, tiebreak) order
    * wins, matching "latest at-or-before".
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedLeft = valueCols
      .foldLeft(left.withColumn("__is_left", lit(1))) { (d, v) =>
        d.withColumn(s"__v_$v", lit(null).cast(right.schema(v).dataType))
      }
    val taggedRight = {
      val base = right.select(
        (keyCols.map(col) :+ col(tsCol)) ++ valueCols.map(v => col(v).as(s"__v_$v")): _*)
      val withLeftShape = leftCols.diff(keyCols :+ tsCol)
        .foldLeft(base)((d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      withLeftShape.withColumn("__is_left", lit(0))
    }
    val unioned = taggedLeft.unionByName(taggedRight.select(taggedLeft.columns.map(col).toSeq: _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (d, v) =>
      d.withColumn(s"__last_$v", last(col(s"__v_$v"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++ valueCols.map(v => col(s"__last_$v").as(s"asof_$v")): _*)
  }

  /** Interval/range join against a (usually small) intervals table:
    * rows of `facts` matched to intervals with lo <= v < hi. Broadcasts
    * the intervals side — O(|facts|·|intervals|) comparisons but zero
    * shuffle; for large interval sets switch to a bucketized equi-join
    * on quantized ranges. */
  def intervalJoin(facts: DataFrame, intervals: DataFrame,
      valueCol: Column, loCol: Column, hiCol: Column): DataFrame =
    facts.join(broadcast(intervals), valueCol >= loCol && valueCol < hiCol)

  /** Bloom-pre-filtered equi-join: build a Bloom filter over the (small)
    * build side's join keys, cut the probe side down BEFORE it reaches
    * the shuffle, then run the real join — false positives are removed
    * by the join itself, so the result is exactly `probe ⋈ build`.
    *
    * This is the explicit form of the runtime-filter pushdown a 100 TB
    * join wants when the build side is selective but too large to
    * broadcast as a hash relation (a Bloom filter is ~10 bits/key vs
    * ~100+ bytes/row): the probe's shuffle write shrinks by the filter's
    * selectivity. Spark's own `InjectRuntimeFilter` does this at the
    * planner level behind thresholds; pipelines that pre-stage dimension
    * keys (or reuse one filter across many queries) want it explicit.
    * The filter UDF sits outside codegen, but it gates rows before the
    * exchange — the expensive stages still run generated code.
    *
    * `expectedKeys`/`fpp` size the filter; an undersized filter only
    * hurts selectivity (correctness is unaffected).
    */
  def bloomPreFilteredJoin(probe: DataFrame, build: DataFrame,
      probeKey: Column, buildKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StringType}
    val keyType: DataType = build.schema(buildKey).dataType
    val integral = keyType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case StringType => false
      case dt => throw new IllegalArgumentException(
        s"bloomPreFilteredJoin: unsupported key type $dt (integral or string)")
    }
    val bf = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    // type-matched probe: an untyped Long UDF would make the analyzer
    // cast string keys to bigint — an ANSI runtime error (or, non-ANSI,
    // null-for-every-row and a silently empty join)
    val mightContain =
      if (integral)
        udf((k: java.lang.Long) => k != null && bf.mightContainLong(k.longValue()))
          .apply(probeKey.cast("long"))
      else
        udf((k: String) => k != null && bf.mightContainString(k)).apply(probeKey)
    // qualify the build key: a bare col(buildKey) is ambiguous whenever
    // the probe side carries a same-named column (the normal case for
    // shared join-key names)
    probe.filter(mightContain)
      .join(build, probeKey === build(buildKey))
  }
}

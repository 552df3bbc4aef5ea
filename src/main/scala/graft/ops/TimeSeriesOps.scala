package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shaping operators: dense-range gap-fill with linear
  * interpolation, and SCD type-2 history construction.
  *
  * The reference stores per-15-minute slots with silent holes on radar
  * outages (`/root/reference/src/verify_dates.py:21-36` counts files per
  * date precisely because days go missing) and mutable dimension rows
  * stamped `date_created`/`date_updated`
  * (`/root/reference/database/schema.sql:28,40`). These operators make
  * both first-class: holes become explicit interpolated rows, and update
  * stamps become queryable validity intervals.
  *
  * Scale shape: every window below partitions by the series key — one
  * shuffle by key, then arbitrary parallelism across series; the dense
  * range is generated per key with `sequence()` (no driver loop, no
  * cross join against a global calendar table).
  */
object TimeSeriesOps {

  /** Fill every missing `step` in each key's [min(bucket), max(bucket)]
    * range and linearly interpolate `valCol` across gaps on the
    * epoch-second axis. Input must be one row per (key, bucket), and
    * every bucket must be an exact `step` multiple from the per-key
    * min(bucket) — i.e. already truncated to the grid (`date_trunc`
    * output); a non-grid-aligned row would break the gap emission.
    * Null-valued input rows are treated as ABSENT in every respect:
    * their bucket becomes an interpolated gap row whose non-(key,
    * bucket) columns are NULL — the original row's other columns are
    * NOT carried (a null at a key's first/last bucket is dropped
    * entirely; interpolation never extrapolates). Output adds `is_gap`
    * and `val_filled`; present endpoints bracket every gap by
    * construction.
    *
    * Shape: a single `lead()` window gives each present row its next
    * present neighbour, and `explode(sequence(h, next_h - step))` emits
    * the row itself plus every missing bucket before the neighbour —
    * ONE shuffle by key (the window sort), no dense-grid build, no
    * grid⋈input join, no second window pass. Non-(key,bucket) columns
    * are nulled on every emitted gap row.
    */
  def gapFillInterpolate(
      perBucket: DataFrame,
      key: String,
      bucket: String,
      value: String,
      step: String = "INTERVAL 1 HOUR"): DataFrame = {
    val rest = perBucket.columns.filterNot(c => c == key || c == bucket).toSeq
    val typeOf = perBucket.schema.map(f => f.name -> f.dataType).toMap
    val w = Window.partitionBy(col(key)).orderBy(col(bucket))
    val withNext = perBucket
      // null-valued rows act as gaps: dropping them here makes their
      // bucket a GENERATED row interpolated between present neighbours
      // (a lead() over rows that include nulls would poison the whole
      // preceding gap run with null __nv instead)
      .filter(col(value).isNotNull)
      .withColumn("__nh", lead(col(bucket), 1).over(w))
      .withColumn("__nv", lead(col(value), 1).over(w))
      // last row per key: emit itself only (sequence over a null end
      // would null out and explode would drop the row)
      .withColumn("__g", explode(
        when(col("__nh").isNull, array(col(bucket)))
          .otherwise(sequence(col(bucket), col("__nh") - expr(step), expr(step)))))
    val isSelf = col("__g") === col(bucket)
    // identical IEEE op sequence to the oracle: v + (nv - v) * (Δg / Δn)
    val frac =
      (unix_timestamp(col("__g")) - unix_timestamp(col(bucket))).cast("double") /
        (unix_timestamp(col("__nh")) - unix_timestamp(col(bucket))).cast("double")
    val filled =
      when(isSelf, col(value))
        .otherwise(col(value) + (col("__nv") - col(value)) * frac)
    withNext.select(
      col(key) +: col("__g").as(bucket) +:
        (rest.map(c =>
          when(isSelf, col(c)).otherwise(lit(null).cast(typeOf(c))).as(c)) ++
          Seq((!isSelf).as("is_gap"), filled.as("val_filled"))): _*)
  }

  /** Downsample a value stream into per-(key, bucket) OHLC bars:
    * open = first value, close = last value (both by (ts, tie) order —
    * `tie` makes equal timestamps deterministic), high/low = max/min,
    * plus the row count. The classic resample step before charting or
    * model features: 100 TB of ticks becomes |keys|·|buckets| rows.
    *
    * Shape: ONE shuffle — both row_number windows and the final
    * aggregation hash-partition on (key, bucket), so Catalyst plans a
    * single exchange followed by two sorts (asc/desc) and a partial+final
    * aggregate. No self-join, no argmin struct comparison (min_by on a
    * (ts, tie) struct would work but pins struct-ordering semantics;
    * row_number keeps both engines on plain column ordering).
    * Null ts/value rows are dropped first: Spark sorts nulls first,
    * DuckDB last — excluding them keeps open/close engine-portable.
    */
  def ohlcBars(df: DataFrame, key: String, ts: String, value: String,
      tie: String, bucket: Column): DataFrame = {
    val b = df
      .filter(col(ts).isNotNull && col(value).isNotNull)
      .select(col(key), col(ts), col(tie), col(value), bucket.as("bucket"))
    val asc = Window.partitionBy(col(key), col("bucket"))
      .orderBy(col(ts).asc, col(tie).asc)
    val desc = Window.partitionBy(col(key), col("bucket"))
      .orderBy(col(ts).desc, col(tie).desc)
    b.withColumn("__ra", row_number().over(asc))
      .withColumn("__rd", row_number().over(desc))
      .groupBy(col(key), col("bucket"))
      .agg(
        max(when(col("__ra") === 1, col(value))).as("open"),
        max(col(value)).as("high"),
        min(col(value)).as("low"),
        max(when(col("__rd") === 1, col(value))).as("close"),
        count(lit(1)).as("n_events"))
      .orderBy(col(key), col("bucket"))
  }

  /** Last-observation-carried-forward: the most recent non-null `value`
    * at or before each row, per key in (ord…) order. The standard
    * sensor/price fill — null rows inherit, non-null rows pass through.
    * One shuffle (the per-key window sort); the running `last` is a
    * single ordered pass, state = one value.
    */
  def locf(key: String, ord: Seq[Column], value: Column): Column =
    last(value, ignoreNulls = true).over(
      Window.partitionBy(col(key)).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Point-in-time (temporal) join: each fact row picks the SCD2
    * interval of its key that covers its timestamp — `valid_from`
    * inclusive, `valid_to` exclusive, open (NULL) intervals match
    * everything from `valid_from` on. `dim` is [[scd2]] output (or any
    * frame with key/valid_from/valid_to columns tiling each key's
    * timeline, so every fact matches at most once).
    *
    * Shape: an equi-join on the key carrying the range predicate as the
    * join condition — SMJ/shuffled-hash on the key, the range filter
    * applied within key groups. Per-key interval counts (dim versions)
    * bound the fan-in, never the fact volume.
    */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame,
      factKey: String, factTs: String, dimKey: String): DataFrame =
    facts.join(dim,
      facts(factKey) === dim(dimKey) &&
        facts(factTs) >= dim("valid_from") &&
        (facts(factTs) < dim("valid_to") || dim("valid_to").isNull))

  /** Collapse a change-event stream into SCD2 validity intervals: one row
    * per (key, status run), `valid_from` inclusive, `valid_to` exclusive
    * (NULL = current), `version` counting runs per key. `tie` breaks
    * equal timestamps deterministically.
    */
  def scd2(
      events: DataFrame,
      key: Column,
      status: Column,
      ts: Column,
      tie: Column): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(ts.asc, tie.asc)
    val changes = events
      .withColumn("graft_prev", lag(status, 1).over(byKey))
      .filter(col("graft_prev").isNull || col("graft_prev") =!= status)
    val byChange = Window.partitionBy(key).orderBy(ts.asc, tie.asc)
    changes.select(
      key.as("key"),
      status.as("status"),
      ts.as("valid_from"),
      lead(ts, 1).over(byChange).as("valid_to"),
      row_number().over(byChange).as("version"))
  }
}

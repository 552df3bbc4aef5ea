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
    * output). A non-grid-aligned row would not match the generated
    * dense grid on the left join and would be silently dropped.
    * Output adds `is_gap` and `val_filled`; endpoints are present by
    * construction so interpolation never extrapolates.
    */
  def gapFillInterpolate(
      perBucket: DataFrame,
      key: String,
      bucket: String,
      value: String,
      step: String = "INTERVAL 1 HOUR"): DataFrame = {
    val dense = perBucket.groupBy(col(key))
      .agg(min(col(bucket)).as("h0"), max(col(bucket)).as("h1"))
      .select(col(key),
        explode(sequence(col("h0"), col("h1"), expr(step))).as(bucket))
    val joined = dense.join(perBucket, Seq(key, bucket), "left")
    val wPrev = Window.partitionBy(col(key)).orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(key)).orderBy(col(bucket))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val present = when(col(value).isNotNull, struct(col(bucket).as("h"), col(value).as("v")))
    val p = last(present, ignoreNulls = true).over(wPrev)
    val n = first(present, ignoreNulls = true).over(wNext)
    joined
      .withColumn("p", p).withColumn("n", n)
      .withColumn("is_gap", col(value).isNull)
      .withColumn("val_filled",
        when(col(value).isNotNull, col(value)).otherwise(
          col("p.v") + (col("n.v") - col("p.v")) *
            ((unix_timestamp(col(bucket)) - unix_timestamp(col("p.h"))).cast("double") /
              (unix_timestamp(col("n.h")) - unix_timestamp(col("p.h"))).cast("double"))))
      .drop("p", "n")
  }

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

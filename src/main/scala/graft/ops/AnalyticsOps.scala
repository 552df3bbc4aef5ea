package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Behavioral / statistical analytics operators: staged funnels, cohort
  * retention, least-squares trends, interval concurrency, z-score
  * outliers, and weighted percentiles.
  *
  * The reference's flows table is exactly this kind of event series —
  * per-15-minute counts per radar (`/root/reference/database/schema.sql:52-71`)
  * queried "for analysis" (`/root/reference/README.md:3`) — and these are
  * the first analyses a traffic warehouse asks of it.
  *
  * Scale shape: every operator reduces to per-key aggregates or per-key
  * ordered windows — one hash shuffle on the entity/group key, then
  * arbitrary parallelism across keys; no driver-side loops, no collects.
  * Float determinism: moments route through DECIMAL power sums (order-
  * independent under any shuffle layout), derived doubles keep a fixed
  * IEEE op sequence (see the DuckDB-oracled q91-q96 twins).
  */
object AnalyticsOps {

  /** K-stage conversion funnel: stage k counts entities whose earliest
    * stage-k event strictly follows their earliest qualifying
    * stage-(k-1) event. Returns (stage, step, users, pct_of_top).
    * Each stage is a per-entity min — every shuffle carries ≤ one row
    * per entity, co-partitioned on the entity key across stages.
    */
  def funnel(events: DataFrame, user: String, eventType: String,
      ts: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var reached: DataFrame = null
    var acc: DataFrame = null
    stages.zipWithIndex.foreach { case (st, i) =>
      val f = events.filter(col(eventType) === st)
      val g =
        if (i == 0) f.groupBy(col(user)).agg(min(col(ts)).as("__t"))
        else f.join(reached.select(col(user), col("__t").as("__pt")), user)
          .filter(col(ts) > col("__pt"))
          .groupBy(col(user)).agg(min(col(ts)).as("__t"))
      reached = g
      val row = g.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage"), lit(st).as("step"), col("users"))
      acc = if (acc == null) row else acc.unionAll(row)
    }
    acc
      .withColumn("pct_of_top",
        round(col("users").cast("double") /
          max(col("users")).over(Window.partitionBy()).cast("double"), 6))
      .orderBy(col("stage"))
  }

  /** Weekly cohort retention: cohort = Monday-truncated week of an
    * entity's first event; cell (cohort, k) counts entities active in
    * cohort week + k. Returns (cohort_week yyyy-MM-dd, week_offset,
    * active_users). The distinct (entity, week) set bounds shuffle size
    * by entities × weeks regardless of raw event volume.
    */
  def cohortRetention(events: DataFrame, user: String, ts: String): DataFrame = {
    val cohort = events.groupBy(col(user))
      .agg(date_trunc("week", min(col(ts))).as("__cw"))
    val active = events
      .select(col(user), date_trunc("week", col(ts)).as("__wk"))
      .distinct()
    active.join(cohort, user)
      // both weeks are Monday-truncated so the day delta is an exact
      // multiple of 7; integer `div` keeps it exact under ANSI
      .select(col("__cw"),
        expr("CAST(datediff(CAST(__wk AS DATE), CAST(__cw AS DATE)) div 7 AS INT)")
          .as("week_offset"))
      .groupBy(col("__cw"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .select(date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("active_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Per-group least-squares fit of y against an integer x: returns
    * (group, n, slope, intercept) from exact integer/DECIMAL power sums
    * — the only doubles are the final closed-form divisions, so results
    * are independent of partitioning and identical across engines.
    * `x` must be integral (day index, slot number); `y` decimal-castable.
    */
  def linearTrend(df: DataFrame, group: String, x: Column, y: Column): DataFrame = {
    val src = df.select(col(group), x.cast("long").as("__x"),
      y.cast(DecimalType(18, 2)).as("__y"))
    val m = src.groupBy(col(group)).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).cast("double").as("sx"),
      // x*x as Long — an Int multiply overflows (ANSI: throws) at
      // x ≥ 46341, well inside a minute-granularity slot index
      sum(col("__x") * col("__x")).cast("double").as("sxx"),
      sum(col("__y")).cast("double").as("sy"),
      sum(col("__x").cast(DecimalType(10, 0)) * col("__y"))
        .cast("double").as("sxy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    m.select(col(group), col("n"),
        round(slope, 6).as("slope"),
        round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"))
      .orderBy(col(group))
  }

  /** Peak interval concurrency per group via sweep line: unpivot
    * [start, end) intervals to ±1 boundary deltas, ordered prefix sum
    * per group, report (group, peak, peak_ts = earliest peak instant).
    * Ends sort before starts at the same instant (delta -1 < +1) so
    * back-to-back intervals never count as concurrent. `id` breaks the
    * remaining ties so the prefix sum is deterministic.
    */
  def peakConcurrency(df: DataFrame, group: String, start: String,
      end: String, id: String): DataFrame = {
    // null boundaries would sort FIRST in Spark's window (nulls-first
    // asc) and drive the running sum negative — a silent undercount;
    // an interval without both endpoints simply doesn't participate
    val iv = df.filter(col(start).isNotNull && col(end).isNotNull)
    val b = iv.select(col(group), col(start).as("__t"),
        lit(1).as("__delta"), col(id))
      .unionAll(iv.select(col(group), col(end).as("__t"),
        lit(-1).as("__delta"), col(id)))
    val w = Window.partitionBy(col(group))
      .orderBy(col("__t"), col("__delta"), col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the whole-partition max shares the prefix sum's partitioning — one
    // shuffle, one pass (a groupBy+self-join would recompute the sweep
    // on both sides and shuffle again)
    val r = b.withColumn("__run", sum(col("__delta")).over(w))
      .withColumn("__peak", max(col("__run")).over(Window.partitionBy(col(group))))
    r.filter(col("__run") === col("__peak"))
      .groupBy(col(group), col("__peak"))
      .agg(min(col("__t")).as("peak_ts"))
      .select(col(group), col("__peak").cast("int").as("peak"), col("peak_ts"))
      .orderBy(col(group))
  }

  /** Rows whose value deviates from their key's mean by more than
    * `zThreshold` standard deviations (population), computed from
    * DECIMAL-exact moments with a sqrt-free predicate
    * (dev² > z²·var). Keys with fewer than `minN` rows are skipped
    * (their variance estimate is noise). Returns one row per flagged
    * input row, projected to (id, key, value, z2 = dev²/var rounded to
    * 6dp) — join back on `id` for the remaining input columns.
    */
  def zscoreOutliers(df: DataFrame, key: String, value: String, id: String,
      zThreshold: Int = 2, minN: Int = 10): DataFrame = {
    val m = df.groupBy(col(key)).agg(
      count(lit(1)).as("__n"),
      sum(col(value).cast(DecimalType(18, 6))).cast("double").as("__sv"),
      sum((col(value) * col(value)).cast(DecimalType(28, 6)))
        .cast("double").as("__svv"))
    val dev = col(value) - col("__sv") / col("__n")
    val varPop = (col("__svv") - col("__sv") * col("__sv") / col("__n")) /
      col("__n")
    // varPop > 0 guard: a (near-)constant key cancels to a zero or
    // slightly NEGATIVE double variance — without the guard every row
    // of such a key is flagged (and an exact 0 divides by zero under
    // ANSI). Constant keys simply have no outliers.
    df.join(m, key).filter(col("__n") >= minN)
      .filter(varPop > 0 &&
        dev * dev > lit(zThreshold * zThreshold) * varPop)
      .select(col(id), col(key), col(value),
        round(dev * dev / varPop, 6).as("z2"))
      .orderBy(col(id))
  }

  /** Chi-square test of independence between two categorical columns:
    * contingency cell counts, expected = rowTot·colTot/n, statistic
    * Σ (obs−exp)²/exp. Each cell term is a deterministic double (fixed
    * op sequence over exact integer totals); terms sum as DECIMAL so the
    * reduce is order-independent under any partitioning. Returns one row
    * (chi2, dof, n). Cells are |A|×|B| — the windows that build the
    * marginals run over the cell table, never the raw fact.
    */
  def chiSquare(df: DataFrame, a: String, b: String): DataFrame = {
    // NULL categories are excluded up front: they'd survive the groupBy
    // but never match the densifying (non-null-safe) join, producing
    // zero marginals → 0/0 terms (an ANSI error on the decimal cast)
    // and an n inconsistent with dof
    val sparse = df
      .filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a), col(b)).agg(count(lit(1)).as("obs"))
    // densify: absent (a,b) combinations are REAL zero cells — each
    // contributes its full expected count to the statistic; a groupBy
    // alone would silently understate chi² for sparse tables. Both
    // sides are category lists (bounded by |A| and |B|, not by the
    // fact), but they sit behind aggregations whose output size the
    // optimizer can't estimate — without the explicit broadcast this
    // plans a SHUFFLED CartesianProduct.
    val cells = sparse.select(col(a)).distinct()
      .crossJoin(broadcast(sparse.select(col(b)).distinct()))
      .join(sparse, Seq(a, b), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
    val rowW = Window.partitionBy(col(a))
    val colW = Window.partitionBy(col(b))
    val allW = Window.partitionBy()
    val t = cells
      .withColumn("rt", sum(col("obs")).over(rowW))
      .withColumn("ct", sum(col("obs")).over(colW))
      .withColumn("n", sum(col("obs")).over(allW))
    val exp = (col("rt") * col("ct")).cast("double") / col("n")
    val term = (col("obs") - exp) * (col("obs") - exp) / exp
    t.withColumn("term", term.cast(DecimalType(24, 8)))
      .agg(
        round(sum(col("term")).cast("double"), 6).as("chi2"),
        ((countDistinct(col(a)) - 1) * (countDistinct(col(b)) - 1))
          .cast("int").as("dof"),
        max(col("n")).as("n"))
  }

  /** Exact weighted median per group: cumulative integer weights along a
    * totally ordered window (value, then `ties` for determinism), first
    * value where 2·cum ≥ total weight. All-integer weight arithmetic —
    * no float accumulation at any scale. One shuffle (the per-group
    * sort). Weights are floor()ed to integers EXPLICITLY — a bare
    * long cast truncates in Spark but rounds in several SQL engines,
    * so fractional weights would silently mean different things; floor
    * is the one portable reading (and the identity for the intended
    * integral weights).
    *
    * Round-17 A/B note: folding equal (group, value) rows first
    * (groupBy(g, v).agg(sum(w)) before the window) is result-identical
    * and would bound the sort by |distinct values| — but on the engine's
    * fact shape the value column is near-unique (594 330 distinct
    * (rf, price) pairs in 600 000 rows at sf0.1), so the fold's extra
    * exchange + hash agg measured as a pure loss (1.36 → 1.49 s warm).
    * Reach for the fold only when the value domain is genuinely small.
    */
  def weightedMedian(df: DataFrame, group: String, value: String,
      weight: String, ties: Seq[String]): DataFrame = {
    val cumW = Window.partitionBy(col(group))
      .orderBy((col(value) +: ties.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col(group))
    df.select((Seq(col(group), col(value),
        floor(col(weight)).cast("long").as("__q")) ++ ties.map(col)): _*)
      .withColumn("__cum", sum(col("__q")).over(cumW))
      .withColumn("__tot", sum(col("__q")).over(totW))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(col(group)).agg(min(col(value)).as("weighted_median"))
      .orderBy(col(group))
  }

  /** Running distinct-entity count per time bucket — the scalable form
    * of `count(DISTINCT …) OVER (ORDER BY day)`. The naive window
    * re-scans every prefix (O(n·days) state); this reduces each entity
    * to its FIRST bucket, counts arrivals per bucket, and prefix-sums
    * the |buckets|-sized series. Two aggregations + one tiny window —
    * event volume only touches the first (per-entity min) shuffle.
    * Returns (bucket, new_entities, cume_entities).
    */
  def cumulativeDistinct(df: DataFrame, entity: String,
      bucket: Column): DataFrame = {
    val firstSeen = df.select(col(entity).as("e"), bucket.as("bucket"))
      .groupBy(col("e")).agg(min(col("bucket")).as("bucket"))
    firstSeen.groupBy(col("bucket"))
      .agg(count(lit(1)).as("new_entities"))
      .withColumn("cume_entities", sum(col("new_entities")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("bucket"))
  }

  /** Two-proportion A/B comparison from exact per-variant counts:
    * entities, converters (entities with ≥ 1 conversion event), rates,
    * absolute lift (B − A), and the pooled two-proportion z statistic.
    * Everything reduces to four integer counts before any double math,
    * so the statistic is a fixed closed-form IEEE sequence — exact under
    * any partitioning and engine-portable. Exactly two variants
    * required (z is pairwise); both shuffles key on entity then
    * variant, both tiny.
    */
  def abLift(df: DataFrame, variant: String, entity: String,
      converted: Column): DataFrame = {
    val perEntity = df.groupBy(col(variant).as("v"), col(entity))
      .agg(max(when(converted, 1L).otherwise(0L)).as("c"))
    val perVariant = perEntity.groupBy(col("v"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("conv"))
    // two-row → one-row reshape by conditional aggregation over the
    // window-tagged variant table (2 rows — every op here is trivial);
    // assert_true turns misuse into a loud failure: >2 variants, and a
    // NULL variant too — NULL would pass the count check but fall out
    // of BOTH when(__isa)/when(!__isa) branches (three-valued logic),
    // silently emitting a degenerate half-NULL row
    val w = Window.partitionBy()
    val tagged = perVariant
      .withColumn("__chk", assert_true(
        count(lit(1)).over(w) === 2 &&
          sum(when(col("v").isNull, 1).otherwise(0)).over(w) === 0,
        lit("abLift requires exactly two non-null variants")))
      .withColumn("__isa", col("v") === min(col("v")).over(w))
      .filter(col("__chk").isNull) // always true; forces the assertion
    val one = tagged.agg(
      min(col("v")).as("variant_a"), max(col("v")).as("variant_b"),
      sum(when(col("__isa"), col("n"))).as("n_a"),
      sum(when(col("__isa"), col("conv"))).as("conv_a"),
      sum(when(!col("__isa"), col("n"))).as("n_b"),
      sum(when(!col("__isa"), col("conv"))).as("conv_b"))
    val pA = col("conv_a").cast("double") / col("n_a")
    val pB = col("conv_b").cast("double") / col("n_b")
    val pool = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val denom = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    one.select(col("variant_a"), col("variant_b"),
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(pA, 6).as("rate_a"), round(pB, 6).as("rate_b"),
      round(pB - pA, 6).as("lift"),
      // all-converted / none-converted pools have zero variance: NULL z
      when(denom > 0, round((pB - pA) / denom, 6)).as("z"))
  }

  /** Robust outlier summary per key: median, MAD (median absolute
    * deviation), and how many rows deviate by more than `k`·MAD. The
    * z-score flagger above assumes roughly normal data; MAD survives the
    * heavy tails and asymmetry real telemetry has (one stuck radar
    * emitting 10⁶ doesn't drag the threshold the way it drags a mean).
    *
    * Shape: three aggregations and one fact re-join, ALL hash-partitioned
    * by `key` — Catalyst reuses one exchange for the chain. `percentile`
    * is holistic (buffers one group per key), so the per-key row count —
    * not the table — must fit an executor; at 100 TB that holds because
    * keys are users/devices, and a approx_percentile swap is one line if
    * a single key ever grows pathological. A key with MAD = 0 (over half
    * its values identical) flags every deviating row — that degeneracy is
    * the documented behaviour, not an error.
    */
  def madOutliers(df: DataFrame, key: String, value: String,
      k: Int = 3): DataFrame = {
    val med = df.groupBy(col(key))
      .agg(expr(s"percentile($value, 0.5)").as("__med"))
    val dev = df.join(med, key)
      .withColumn("__adev", abs(col(value) - col("__med")))
    val mad = dev.groupBy(col(key)).agg(
      count(lit(1)).as("n"),
      first(col("__med")).as("med"),
      expr("percentile(__adev, 0.5)").as("__mad"))
    dev.select(col(key), col(value), col("__adev"))
      .join(mad, key)
      .groupBy(col(key))
      .agg(
        first(col("n")).as("n"),
        round(first(col("med")), 6).as("med"),
        round(first(col("__mad")), 6).as("mad"),
        sum(when(col("__adev") > lit(k) * col("__mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col(key))
  }

  /** Winsorize `value` within each `group`: clamp to that group's exact
    * [pLo, pHi] percentile band, report per-group n, clamp counts, and
    * the DECIMAL-exact mean of the clamped values. Clamping (rather than
    * dropping) keeps row counts stable for downstream joins — the
    * standard tail-taming step before trend fits or funnels on metrics
    * with rare huge values.
    *
    * Shape: one percentile aggregation by group + one fact re-join on
    * the same key (exchange reuse), then one final aggregation. The mean
    * routes through DECIMAL(18,6) sums so the reduce is order-independent
    * under any partitioning; the clamp itself (least/greatest) is exact.
    */
  def winsorize(df: DataFrame, group: String, value: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad band [$pLo, $pHi]")
    val bands = df.groupBy(col(group)).agg(
      expr(s"percentile($value, $pLo)").as("__lo"),
      expr(s"percentile($value, $pHi)").as("__hi"))
    val clamped = least(greatest(col(value), col("__lo")), col("__hi"))
    df.join(bands, group)
      .select(col(group), col(value), col("__lo"), col("__hi"),
        clamped.as("__c"))
      .groupBy(col(group))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(value) < col("__lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col(value) > col("__hi"), 1L).otherwise(0L)).as("n_hi"),
        round(first(col("__lo")), 6).as("p_lo"),
        round(first(col("__hi")), 6).as("p_hi"),
        round(sum(col("__c").cast(DecimalType(18, 6))).cast("double") /
          count(lit(1)), 6).as("wins_mean"))
      .orderBy(col(group))
  }
}

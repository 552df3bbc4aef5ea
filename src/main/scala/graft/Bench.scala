package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.runtime.Lifetime

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}. Each query is fully
  * materialized through the noop sink (count() alone would let Catalyst
  * prune the aggregates away).
  *
  * State hygiene: a 129-query session leaks checkpointed partitions,
  * cached tables, shuffle files, and broadcasts if left to the
  * ContextCleaner (which only fires on driver GC) — round 4 measured a
  * monotone 2-65× per-query degradation toward the tail of the run from
  * exactly this. So between timed runs the harness drops every cached
  * table and persistent RDD, and periodically nudges GC so the cleaner
  * reclaims shuffle/broadcast state; each timing then measures the plan,
  * not the graveyard of its predecessors.
  */
object Bench {
  private def benchLoadAvg(): String =
    try {
      val parts = Files.readString(Paths.get("/proc/loadavg"))
        .trim.split(" ")
      s"[${parts(0)},${parts(1)},${parts(2)}]"
    } catch { case _: Throwable => "null" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // sample load BEFORE the session exists: sampled any later, the
    // 1-min average reflects the bench's own JVM/warmup ramp and reads
    // ~1.5 even on a genuinely idle machine (observed round 15)
    val loadStart = benchLoadAvg()
    // engine-owned session defaults (the AQE fan-out floor and its
    // rationale live in GraftExtensions.sessionDefaults — ONE source of
    // truth for the benched and the shipped execution shape)
    val spark = graft.functions.GraftExtensions.sessionDefaults(
      SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen/parquet-footer warmup outside the timings
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    var sinceGc = 0
    def hygiene(): Unit = {
      Lifetime.releaseAll(spark, blocking = true)
      sinceGc += 1
      if (sinceGc >= 8) { sinceGc = 0; System.gc() }
    }
    hygiene()
    // two timed passes per query, report the min: single-pass timings on
    // a shared VM mix page-cache/JIT warmup and neighbor noise into the
    // number; min-of-2 is the steady-state cost of the plan itself.
    // Returns (elapsed, succeeded). A failing pass must NOT contribute its
    // (artificially fast) elapsed time to the min — a transient error would
    // otherwise read as a speedup while the failure only hit stderr.
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      hygiene() // outside the timing: each run starts from a clean session
      (dt, ok)
    }
    // the passes INTERLEAVE (every query once, then every query again)
    // rather than running a query's samples back-to-back: the host's
    // interference comes in multi-second bursts, and consecutive samples
    // of one query all land inside a burst — the min then keeps the
    // inflated number. With a full pass between samples, a burst has to
    // strike the SAME query in EVERY pass to survive the min. Three
    // passes: the burst pathology measured 4-25× inflation (SCALE.md
    // round-5 notes), so one extra sweep is cheap insurance against a
    // whole round's timings reading as regressions.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // host context rides the artifact (round-14 verdict item 2: a noisy
    // round's numbers were unattributable because the load at capture
    // time lived only in prose): load_start is the 1/5/15-min averages
    // sampled BEFORE the SparkSession existed (see benchLoadAvg at the
    // top of main — sampled any later it reads the bench's own ramp),
    // load_end is sampled after the passes (and so reflects the bench's
    // own 8 threads), plus the core counts — a reader can tell a quiet
    // capture from an inflated one WITHOUT trusting notes
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    def pass(): Seq[(String, (Double, Boolean))] =
      ordered.map { case (name, fn) => name -> timeOnce(name, fn) }
    val results = Seq.fill(runs)(pass()).transpose.map { samples =>
      val good = samples.collect { case (_, (dt, true)) => dt }
      samples.head._1 -> (if (good.nonEmpty) Some(good.min) else None)
    }
    val failed = results.collect { case (name, None) => name }
    def ms(v: Double): String = (math.rint(v * 1000) / 1000).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.fold("-1")(ms) }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // bench_threads as a JSON string: SPARK_GRAFT_CPUS admits any
    // local[...] thread spec (e.g. "*"), which bare would break the
    // artifact's JSON
    val host = s"""{"load_start":$loadStart,"load_end":${benchLoadAvg()},""" +
      s""""cores":${Runtime.getRuntime.availableProcessors},""" +
      s""""bench_threads":"$cpus"}"""
    val json = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","runs_per_query":$runs,"agg":"min","failed":$failedJson,"host":$host}"""
    try Files.writeString(Paths.get("BENCH_LAST.json"), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_LAST.json: ${e.getMessage}")
    }
    // The harness that invokes this main captures EXACTLY a 2000-char
    // tail of stdout and json-parses the LAST line (measured: every
    // BENCH_rNN.json artifact carries tail_len=2000; rounds 1-8, whose
    // last line was the per-query JSON, ALL arrived parsed:null — the
    // head of the line fell off the window — and from round 9 on the
    // totals-only last line parses). The round-16 verdict asked for
    // per_query folded into that one parsed line, but the arithmetic
    // forbids it at this registry size: 206 entries cost ≥ 2 100 chars
    // even at short-key/1-decimal encoding (full names at millisecond
    // precision: ~4 800), so ANY combined last line would overflow the
    // window and destroy the TOTAL as well — the rounds-1-8 failure
    // mode exactly. What this block does instead: keep the guaranteed-
    // parse totals-only line LAST, and shape the compact per-query line
    // directly above it so the window carries as many COMPLETE entries
    // as possible for offline reconstruction — scalar fields lead, the
    // queries map is the final key (nothing after it wastes window),
    // and centisecond values drop trailing zeros. Full names +
    // millisecond precision live in BENCH_LAST.json.
    def cs(v: Double): String = {
      val s = (math.rint(v * 100) / 100).toString
      if (s.endsWith(".0")) s.dropRight(2) else s
    }
    val shortKeys = results.map { case (k, _) =>
      k.indexOf('_') match { case -1 => k; case i => k.substring(0, i) }
    }
    // truncation relies on the qNN prefix staying unique — fail loudly if
    // a future name collision would silently drop an entry from the JSON
    require(shortKeys.distinct.size == results.size,
      s"bench short keys collide: ${shortKeys.diff(shortKeys.distinct).distinct.mkString(",")}")
    val qsShort = shortKeys.zip(results).map { case (short, (_, v)) =>
      "\"" + short + "\":" + v.fold("-1")(cs)
    }.mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${cs(total)},"unit":"sec","sf":"$sfDir","runs_per_query":$runs,"agg":"min","failed":$failedJson,"detail":"BENCH_LAST.json","queries":$qsShort}"""
    println(json)
    println(compact)
    val totalsOnly = s"""{"metric":"total","value":${cs(total)},"unit":"sec","n":${results.size},"sf":"$sfDir","runs_per_query":$runs,"agg":"min","failed":$failedJson,"detail":"BENCH_LAST.json"}"""
    println(totalsOnly)
    spark.stop()
  }
}

package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.runtime.Lifetime

/** 10× scale proof-run (VERDICT r4 #6): replicate the sf0.1 tables ten
  * times with disjoint key spaces (≈ sf1) into a scratch dir, then run
  * the most expensive registered queries there — catching memory/skew
  * cliffs the sf0.1 bench cannot see (mega-buckets in LSH, frontier
  * blowup in BFS, window-state growth). Facts and event/corpus tables
  * replicate; dimensions (nation, region) stay fixed, like a real SF
  * scale-up. Key shift = replica · 10⁸, far above any sf0.1 key, so FK
  * joins stay consistent within each replica and never cross replicas.
  */
object ScaleProof {

  private val Shift = 100000000L

  /** columns to shift per replicated table (FK-consistent) */
  private val shiftCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_suppkey", "l_partkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private def generate(spark: SparkSession, src: String, dst: String): Unit = {
    new File(dst).mkdirs()
    for ((table, keys) <- shiftCols) {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val replicated = base
        .withColumn("__rep", explode(sequence(lit(0L), lit(9L))))
      val shifted = keys.foldLeft(replicated) { (df, k) =>
        df.withColumn(k, col(k) + col("__rep") * Shift)
      }.drop("__rep")
      // explode leaves one output task per INPUT split (an 11 MB source
      // becomes one ~100 MB part file) — and file count caps downstream
      // scan parallelism; spread each table over the core count
      shifted.repartition(32)
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"[scale] $table x10 written")
    }
    for (dim <- Seq("nation", "region"))
      spark.read.parquet(s"$src/$dim.parquet")
        .write.mode("overwrite").parquet(s"$dst/$dim.parquet")
    Files.writeString(Paths.get(s"$dst/_DONE"), "ok\n")
  }

  /** The restarted-follower cliff, at sf1: a 10-commit backlog of sf1
    * orders (~15M rows) accumulates BEFORE any subscriber exists, then
    * one `Trigger.AvailableNow` run with `maxFilesPerTrigger` drains it
    * through the NATIVE sink (`format("graft-lake")` both ends) and
    * terminates. Proof obligations: every row lands exactly once (count
    * match), and the drain is genuinely chunked — the sink commits one
    * version per micro-batch, so the landed table's version count IS
    * the batch count. Prints batch-count × rows so SCALE.md can record
    * the drain shape. */
  private def backlogDrain(spark: SparkSession, dst: String): DataFrame = {
    import graft.sources.CommitLog
    val work = Files.createTempDirectory("graft_scale_drain_").toString
    val src = s"$work/src"; val out = s"$work/out"
    val orders = spark.read.parquet(s"$dst/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus").as("flag"))
    // 10 append commits (one per replica key range) — a real backlog,
    // not one giant snapshot
    (0 until 10).foreach { r =>
      val lo = r * Shift; val hi = lo + Shift
      val slice = orders
        .filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
      if (r == 0) {
        slice.write.partitionBy("flag").parquet(src)
        CommitLog.init(spark, src)
      } else CommitLog.append(spark, slice, src)
    }
    val total = CommitLog.read(spark, src).count()
    val files = CommitLog.latest(spark, src).get.files.size
    val q = spark.readStream.format("graft-lake")
      .option("maxFilesPerTrigger", "64").load(src)
      .writeStream.format("graft-lake")
      .partitionBy("flag")
      .option("autoCompact", "true") // bound the landed file count too
      .option("checkpointLocation", s"$work/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(out)
    require(q.awaitTermination(30 * 60 * 1000),
      "AvailableNow drain did not terminate in 30 min")
    val landed = CommitLog.read(spark, out).count()
    val outSnap = CommitLog.latest(spark, out).get
    // one version per micro-batch plus the compaction commits the
    // auto-compact policy issued
    val ops = (1L to outSnap.version)
      .map(v => CommitLog.snapshotAt(spark, out, v).op)
    val batches = ops.count(_ != "compact")
    require(landed == total,
      s"backlog drain lost rows: $landed of $total")
    require(batches >= files / 64,
      s"drain was not chunked: $batches batches for $files files")
    val perPart = outSnap.files.groupBy(f => f.take(f.lastIndexOf('/')))
      .map { case (_, fs) => fs.size }
    require(perPart.max < 32,
      s"auto-compact must bound landed files, got per-partition $perPart")
    println(s"[scale] backlog_drain: $total rows / $files files " +
      s"drained in $batches bounded micro-batches (64 files/trigger); " +
      s"landed ${outSnap.files.size} files after auto-compact " +
      s"(${ops.count(_ == "compact")} maintenance commits)")
    // deep clone the backlog source at this scale: a distributed byte
    // copy of all its files must land row-exact
    val t0 = System.nanoTime()
    CommitLog.cloneTable(spark, src, s"$work/clone")
    val cloned = CommitLog.read(spark, s"$work/clone").count()
    require(cloned == total, s"clone lost rows: $cloned of $total")
    println(f"[scale] clone: $files files / $total rows deep-copied in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.range(batches).toDF("batches")
  }

  /** Branch REBASE/MERGE at sf1 (round-13 verdict item 8): fork the 10×
    * orders lake, advance BOTH sides with multi-hundred-file append
    * churn, then mergeBranch — twice, with ~30× different branch churn
    * — and record wall times. Proof obligations: the merged table is
    * row-exact (main's rows + both sides' appended slices, exactly
    * once), and the merge cost tracks the BRANCH'S CHURN (the file-list
    * algebra is metadata-plane; the manifest merge filters by
    * churn-sized In-lists), not the table's size — the small-churn and
    * big-churn merges run against the SAME table, so their ratio
    * isolates the churn term. */
  private def rebaseMerge(spark: SparkSession, dst: String): DataFrame = {
    import graft.sources.CommitLog
    val work = Files.createTempDirectory("graft_scale_rebase_").toString
    val lake = s"$work/lake"
    val orders = spark.read.parquet(s"$dst/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus").as("flag"))
    orders.repartition(64).write.partitionBy("flag").parquet(lake)
    CommitLog.init(spark, lake, statsCols = Seq("o_orderkey"))
    val tableFiles = CommitLog.latest(spark, lake).get.files.size
    val base = CommitLog.read(spark, lake).count()
    // disjoint fresh-key slices drawn from orders itself (schema-exact)
    def slice(lo: Long, n: Long, shift: Long, files: Int) = orders
      .filter(col("o_orderkey") >= lo && col("o_orderkey") < lo + n)
      .withColumn("o_orderkey", col("o_orderkey") + shift)
      .repartition(files)
    def mergeRound(tag: String, churnFiles: Int, shift: Long): Double = {
      CommitLog.createBranch(spark, lake, tag)
      val before = CommitLog.latest(spark, lake).get.files.size
      // main advances past the fork…
      CommitLog.append(spark, slice(1L, 20000L, shift, 8), lake)
      // …while the branch lands its churn (churnFiles tasks × 3 flags)
      CommitLog.append(spark,
        slice(1L, 20000L, shift + Shift, churnFiles), s"$lake@$tag")
      val churn = CommitLog.latest(spark, s"$lake@$tag").get.files.size -
        before + 8
      val t0 = System.nanoTime()
      CommitLog.mergeBranch(spark, lake, tag)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scale] rebase_merge/$tag: $churn churn files over a " +
        f"$tableFiles-file sf1 table merged in $dt%.2f s")
      dt
    }
    val dtSmall = mergeRound("small", 16, 4 * Shift * 100)
    val dtBig = mergeRound("big", 512, 6 * Shift * 100)
    val got = CommitLog.read(spark, lake).count()
    require(got == base + 4 * 20000L,
      s"rebase_merge lost rows: $got, expected ${base + 4 * 20000L}")
    println(f"[scale] rebase_merge: small-churn $dtSmall%.2f s vs " +
      f"big-churn $dtBig%.2f s on the same $tableFiles-file table — " +
      "the delta is the churn term, the base is per-merge planning")
    spark.range(1).toDF("ok")
  }

  /** Batch-provider FALLBACK pushdown at sf1: a DV-carrying 10× orders
    * lake (deletion vectors force the exact-path relation) takes a
    * partition+range-filtered read. Proof obligations: the commit-log
    * file selection opens only the matching partition's
    * zone-map-surviving files (counted), results stay exact through
    * the DV, and the filtered read is decisively cheaper than the full
    * fallback scan — the PrunedFilteredScan upgrade measured where it
    * matters. */
  private def fallbackScan(spark: SparkSession, dst: String): DataFrame = {
    import graft.sources.CommitLog
    import org.apache.spark.sql.sources.{EqualTo, LessThan}
    val work = Files.createTempDirectory("graft_scale_fb_").toString
    val lake = s"$work/lake"
    val orders = spark.read.parquet(s"$dst/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus").as("flag"))
    orders.repartitionByRange(64, col("o_orderkey"))
      .write.partitionBy("flag").parquet(lake)
    CommitLog.init(spark, lake, statsCols = Seq("o_orderkey"))
    CommitLog.deleteVectors(spark, lake, col("o_orderkey") === 7L)
    val s = CommitLog.latest(spark, lake).get
    require(s.dvs.nonEmpty, "fixture must be on the fallback path")
    val bound = 10000000L // first replica's keys only
    val sel = CommitLog.selectFilesForFilters(spark, lake, s,
      Seq(EqualTo("flag", "O"), LessThan("o_orderkey", bound)))
    println(s"[scale] fallback_scan: selection ${sel.size} of " +
      s"${s.files.size} files for flag='O' AND o_orderkey < $bound")
    require(sel.size * 4 <= s.files.size,
      s"pruning too weak: ${sel.size} of ${s.files.size}")
    def timed(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = df.count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val rel = spark.read.format("graft-lake").load(lake)
    val (nf, tf) = timed(rel.filter(col("flag") === "O" &&
      col("o_orderkey") < bound))
    val (na, ta) = timed(rel)
    val expectF = orders.filter(col("flag") === "O" &&
      col("o_orderkey") < bound && col("o_orderkey") =!= 7L).count()
    val expectA = orders.count() - 1L
    require(nf == expectF && na == expectA,
      s"fallback results drifted: $nf/$expectF filtered, $na/$expectA full")
    println(f"[scale] fallback_scan: filtered $tf%.2f s vs full $ta%.2f s" +
      f" (${s.files.size} files, DV active, results exact)")
    spark.range(1).toDF("ok")
  }

  /** Multi-table transaction at sf1: the writeAll cost claim —
    * O(batch) appends + hit-file-proportional deletes + a kilobyte
    * manifest, NEVER table-proportional — measured on two family
    * scales ~30× apart running the IDENTICAL transaction (same batch
    * rows, same delete hit shape). Proof obligations: the big family's
    * transaction lands within a small constant of the small family's
    * (a table-size term would show up as ~30×), both cuts are exact
    * (final counts replay to the model), and the purge+append is
    * atomic through the manifest. */
  private def txnFamily(spark: SparkSession, dst: String): DataFrame = {
    import graft.sources.{CommitLog, LakeTxn}
    val work = Files.createTempDirectory("graft_scale_txn_").toString
    val orders = spark.read.parquet(s"$dst/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus").as("flag"))
    def mkLake(path: String, df: org.apache.spark.sql.DataFrame,
        parts: Int): Long = {
      df.repartition(parts).write.partitionBy("flag").parquet(path)
      CommitLog.init(spark, path, statsCols = Seq("o_orderkey"))
      CommitLog.read(spark, path).count()
    }
    def slice(lo: Long, n: Long, shift: Long) = orders
      .filter(col("o_orderkey") >= lo && col("o_orderkey") < lo + n)
      .withColumn("o_orderkey", col("o_orderkey") + shift)
      .repartition(4)
    def family(tag: String, fact: org.apache.spark.sql.DataFrame,
        ret: org.apache.spark.sql.DataFrame, factParts: Int,
        retParts: Int, shift: Long): (Double, Long, Long, Int) = {
      val f = s"$work/$tag/fact"; val r = s"$work/$tag/ret"
      val txn = s"$work/$tag/txn"
      val nf = mkLake(f, fact, factParts)
      val nr = mkLake(r, ret, retParts)
      LakeTxn.commit(spark, txn, Map(f -> 1L, r -> 1L))
      // MIN OF 3 identically-shaped reps (ADVICE round 15): the small
      // family's wall clock is dominated by fixed per-commit overhead
      // (manifest CAS, job launch), so a single-sample ratio could trip
      // the gate on one noisy-host outlier with no table-size term
      // anywhere. Each rep k: an odd txn seeds its OWN retention slice
      // (so the measured purge always hits real files, never all-miss
      // metadata), the even txn is the measured fact-append + purge.
      var dt = Double.MaxValue
      val files = {
        // seed rep 0 first so the file count reflects the measured shape
        LakeTxn.writeAll(spark, txn, Seq(
          LakeTxn.TxnAppend(f, slice(1L, 20000L, shift)),
          LakeTxn.TxnAppend(r, slice(1L, 2000L, shift))), batchId = 1L)
        CommitLog.latest(spark, f).get.files.size
      }
      (0 until 3).foreach { k =>
        val seedShift = shift + (2L * k) * Shift
        val factShift = shift + (2L * k + 1L) * Shift
        if (k > 0) LakeTxn.writeAll(spark, txn, Seq(
          LakeTxn.TxnAppend(f, slice(1L, 20000L, seedShift)),
          LakeTxn.TxnAppend(r, slice(1L, 2000L, seedShift))),
          batchId = 2L * k + 1L)
        val t0 = System.nanoTime()
        LakeTxn.writeAll(spark, txn, Seq(
          LakeTxn.TxnAppend(f, slice(1L, 20000L, factShift)),
          LakeTxn.TxnDelete(r,
            col("o_orderkey") >= seedShift &&
              col("o_orderkey") < seedShift + 2001L)),
          batchId = 2L * k + 2L)
        dt = math.min(dt, (System.nanoTime() - t0) / 1e9)
      }
      val gotF = LakeTxn.read(spark, txn, f).count()
      val gotR = LakeTxn.read(spark, txn, r).count()
      require(gotF == nf + 3L * 40000L,
        s"txn_family/$tag fact drifted: $gotF vs ${nf + 3L * 40000L}")
      require(gotR == nr, // each rep: +2000 seeded, −2000 purged
        s"txn_family/$tag retention drifted: $gotR vs $nr")
      (dt, nf, nr, files)
    }
    val bigShift = 40L * Shift
    val (dtBig, bf, br, bigFiles) = family("big",
      orders, orders.filter(col("o_orderkey") % 10 === 0), 64, 8,
      bigShift)
    val (dtSmall, sf2, sr, smallFiles) = family("small",
      orders.filter(col("o_orderkey") % 30 === 0),
      orders.filter(col("o_orderkey") % 300 === 0), 4, 2,
      bigShift + 20L * Shift)
    println(f"[scale] txn_family: identical purge+append txn (min of 3) — " +
      f"$bf%,d-row/$bigFiles-file family $dtBig%.2f s vs " +
      f"${sf2}%,d-row/$smallFiles-file family $dtSmall%.2f s " +
      f"(${bf / math.max(sf2, 1L)}x the rows, ${dtBig / dtSmall}%.2fx the cost)")
    require(dtBig <= dtSmall * 6,
      f"txn_family: a table-size term leaked into writeAll — " +
        f"$dtBig%.2f s vs $dtSmall%.2f s at ~30x rows")
    spark.range(1).toDF("ok")
  }

  /** round-16: the ATOMIC MULTI-TABLE STREAMING sink's per-trigger
    * O(churn) claim ([[graft.streaming.StreamingIngest
    * .txnFanoutStream]]): a 3-trigger drain — each micro-batch a fact
    * append + a keyed state upsert landing as ONE family cut — runs
    * against a big family (sf1 orders, ~15M rows/lake) and a ~30×
    * smaller one with IDENTICAL triggers (the same 20k-row batches,
    * keyed into their own churn partition — the documented
    * partition-by-churn-locality contract, so the upsert's
    * copy-on-write is bounded by the hot partition, never the lake).
    * Per-trigger cost is the batch's two verbs + one kilobyte manifest
    * CAS; a table-size term would read as ~30×. Gate: min-of-2 drains
    * (each a fresh stream/checkpoint/family over the same lakes),
    * big ≤ 6× small. Exactness per drain: both tables gain exactly
    * 60k rows and the family head pins one cut per trigger. */
  private def streamFanout(spark: SparkSession, dst: String): DataFrame = {
    import graft.sources.{CommitLog, LakeTxn}
    val work = Files.createTempDirectory("graft_scale_fanout_").toString
    val orders = spark.read.parquet(s"$dst/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus").as("flag"), lit(1L).as("seq"))
    def mkLake(path: String, df: DataFrame, parts: Int): Long = {
      df.repartition(parts).write.partitionBy("flag").parquet(path)
      CommitLog.init(spark, path)
      CommitLog.read(spark, path).count()
    }
    // identical trigger payloads at both scales: 20k contiguous base
    // keys, shifted into fresh key space, landing in partition "hot"
    def triggers(shift: Long): Seq[DataFrame] = (0 until 3).map { i =>
      orders.filter(col("o_orderkey") >= 1L && col("o_orderkey") <= 20000L)
        .withColumn("o_orderkey", col("o_orderkey") + shift + i * 1000000L)
        .withColumn("flag", lit("hot"))
        .withColumn("seq", lit(2L))
    }
    def family(tag: String, base: DataFrame, parts: Int,
        shift: Long): (Double, Long) = {
      val f = s"$work/$tag/fact"; val st = s"$work/$tag/state"
      val nf = mkLake(f, base, parts)
      mkLake(st, base, parts)
      var dt = Double.MaxValue
      (0 until 2).foreach { rep =>
        val txn = s"$work/$tag/txn$rep"
        LakeTxn.commit(spark, txn, Map(
          f -> CommitLog.latest(spark, f).get.version,
          st -> CommitLog.latest(spark, st).get.version))
        val landing = s"$work/$tag/landing$rep"
        val batches = triggers(shift + (rep + 1L) * 10000000L)
        batches.foreach(_.repartition(1)
          .write.mode("append").parquet(landing))
        val before = (CommitLog.read(spark, f).count(),
          CommitLog.read(spark, st).count())
        val stream = spark.readStream.schema(batches.head.schema)
          .option("maxFilesPerTrigger", "1").parquet(landing)
        val t0 = System.nanoTime()
        val q = graft.streaming.StreamingIngest.txnFanoutStream(
          stream, txn, b => Seq(
            LakeTxn.TxnAppend(f, b),
            LakeTxn.TxnUpsert(st, b, Seq("o_orderkey"), "flag",
              Some("seq"))),
          s"$work/$tag/chk$rep")
        try q.processAllAvailable() finally q.stop()
        dt = math.min(dt, (System.nanoTime() - t0) / 1e9)
        val head = LakeTxn.latest(spark, txn).get
        require(head.txn == 4L, // the seed pin + one cut per trigger
          s"stream_fanout/$tag rep$rep: ${head.txn - 1} cuts for 3 triggers")
        val gotF = LakeTxn.read(spark, txn, f).count()
        val gotS = LakeTxn.read(spark, txn, st).count()
        require(gotF == before._1 + 60000L && gotS == before._2 + 60000L,
          s"stream_fanout/$tag rep$rep drifted: fact $gotF (was " +
            s"${before._1}), state $gotS (was ${before._2})")
      }
      (dt, nf)
    }
    val (dtBig, bf) = family("big", orders, 64, 0L)
    val (dtSmall, sf2) = family("small",
      orders.filter(col("o_orderkey") % 30 === 0), 4, 40L * Shift)
    println(f"[scale] stream_fanout: identical 3-trigger atomic fan-out " +
      f"drain (min of 2) — $bf%,d-row family $dtBig%.2f s vs " +
      f"$sf2%,d-row family $dtSmall%.2f s " +
      f"(${bf / math.max(sf2, 1L)}x the rows, ${dtBig / dtSmall}%.2fx the cost)")
    require(dtBig <= dtSmall * 6,
      f"stream_fanout: a table-size term leaked into the per-trigger " +
        f"path — $dtBig%.2f s vs $dtSmall%.2f s at ~30x rows")
    spark.range(1).toDF("ok")
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = args.headOption.getOrElse("/tmp/graft_sf1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq( // the 10 most expensive of the clean sf0.1 bench; q130 is
        // q84's grid-bucketed scale path — the brute-force baseline is
        // quadratic BY DESIGN and excluded from the scale run
        "q107_pagerank", "q111_basket", "q127_bfs", "q112_triangles",
        "q71_moments", "q130_geo_grid", "q21_dedup_minhash",
        "q100_bloom_join", "q78_sql_volume", "q50_components",
        // round-12 engine-surface proofs at sf1: the catalog lifecycle
        // (DDL+DML on named tables), the v2 write surface with
        // multi-level dynamic overwrite, the multi-clause evolving SQL
        // MERGE, widen-then-aggregate, and the streaming table read —
        // each builds its lake off the sf1 orders scan, so the run
        // measures that commits stay churn-sized while the scan side
        // grows 10x (the "metadata commits are O(1) at any size" claim,
        // measured)
        "q184_catalog", "q185_catalog_write", "q177_sql_dml",
        "q186_widen", "q187_stream_table",
        // round-13: the native exactly-once sink lifecycle and the
        // partition-scoped OPTIMIZE at sf1, plus the dedicated
        // 10x-orders BACKLOG DRAIN below (admission-controlled
        // AvailableNow catch-up — the restarted-follower shape)
        "q189_stream_sink", "q190_cdc_replicate", "q188_compact_where",
        // zero-copy branching at sf1 (fork + branch DML + post-fork
        // main append, served off the branch) and the batch
        // format("graft-lake") read/write triangle — the commits stay
        // churn-sized while the scan side grows 10x
        "q191_branch", "q192_format_io",
        // round-14: merge-under-divergence at sf1 (churn-proportional)
        // and the DV-fallback pushdown read
        "rebase_merge", "fallback_scan",
        // round-15: the multi-table transaction's O(batch) claim,
        // measured at two family scales ~30x apart
        "txn_family",
        // round-16: the atomic multi-table STREAMING sink's per-trigger
        // claim, measured at two family scales ~30x apart
        "stream_fanout",
        "backlog_drain")
    // local[8], not local[32]: saturating every advertised CPU trips the
    // host's kernel-side thrash (measured 4-25x inflation at local[32] on
    // identical plans); 8 cores is also how you'd size a real executor
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the sandbox exhibits >10s whole-JVM pauses under load; don't let
      // the in-process heartbeat kill a long proof run over one of them
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new File(s"$dst/_DONE").exists()) generate(spark, src, dst)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val results = names.map { name =>
      val fn =
        if (name == "backlog_drain") backlogDrain _
        else if (name == "rebase_merge") rebaseMerge _
        else if (name == "fallback_scan") fallbackScan _
        else if (name == "txn_family") txnFamily _
        else if (name == "stream_fanout") streamFanout _
        else SparkEntry.queries(name)
      val t0 = System.nanoTime()
      var rows = -1L
      try {
        fn(spark, dst).write.format("noop").mode("overwrite").save()
        rows = 0L
      } catch { case e: Throwable =>
        System.err.println(s"[scale] $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      Lifetime.releaseAll(spark, blocking = true)
      println(f"[scale] $name%-22s ${dt}%8.2f s ${if (rows < 0) "FAILED" else "ok"}")
      (name, dt, rows >= 0)
    }
    val failed = results.count(!_._3)
    println(f"[scale] total ${results.map(_._2).sum}%.1f s, $failed failures")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}

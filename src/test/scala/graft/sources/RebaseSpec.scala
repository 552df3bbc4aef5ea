package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Branch REBASE under divergence — the live-table merge verb
  * fastForward cannot be. Contract under test: a diverged branch's
  * post-fork delta re-applies onto the advanced main head when the two
  * sides' rewritten partitions are disjoint (appends are always
  * clean), true partition conflicts fail loudly naming the partitions
  * and the branch commits, mergeBranch promotes the rebased head and
  * leaves the branch re-usable (fork advanced past the adoption), and
  * the merged state equals the model on randomized interleavings. */
class RebaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Partitioned table (pd = d0/d1/d2 by k/100) with stats on k, so
    * every rebase exercises the manifest merge too. */
  private def freshLake(): String = {
    val dir = Files.createTempDirectory("graft_rebase_").toString + "/lake"
    spark.range(0, 300)
      .select($"id".as("k"), ($"id" % 7).as("v"),
        concat(lit("d"), ($"id" / 100).cast("long")).as("pd"))
      .repartitionByRange(3, $"k")
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir, Seq("k"))
    dir
  }

  private def rows(target: String): Set[(Long, Long)] =
    CommitLog.read(spark, target).select($"k", $"v")
      .as[(Long, Long)].collect().toSet

  test("mergeBranch replays a diverged branch (appends on both sides + " +
    "a branch COW delete on a disjoint partition) onto the advanced " +
    "main head") {
    val dir = freshLake()
    CommitLog.createBranch(spark, dir, "exp")
    val t = CommitLog.branchTarget(dir, "exp")
    // main advances: appends into d0 and d1 (pure adds)
    CommitLog.append(spark, Seq((5000L, 1L, "d0")).toDF("k", "v", "pd"), dir)
    CommitLog.append(spark, Seq((5001L, 2L, "d1")).toDF("k", "v", "pd"), dir)
    // branch diverges: a COW delete in d2 (k 200-219) + its own append
    CommitLog.delete(spark, t, col("k") >= 200L && col("k") < 220L)
    CommitLog.append(spark, Seq((7000L, 3L, "d0")).toDF("k", "v", "pd"), t)
    // fastForward alone must refuse (histories diverged)
    val ff = intercept[CommitLog.DivergedException](
      CommitLog.fastForward(spark, dir, "exp"))
    assert(ff.getMessage.contains("advanced past the fork"))

    val expected = (0L until 300L).filterNot(k => k >= 200L && k < 220L)
      .map(k => (k, k % 7)).toSet ++
      Set((5000L, 1L), (5001L, 2L), (7000L, 3L))
    val adopted = CommitLog.mergeBranch(spark, dir, "exp")
    assert(adopted.op == "fastForward")
    assert(rows(dir) == expected, "main after merge diverged from model")
    // the branch is re-pointed at the adopted version: content-equal
    // and fork marker advanced past the adoption
    assert(rows(t) == expected)
    val head = CommitLog.latest(spark, t).get
    assert(head.props("graft.branch.fork").toLong == adopted.version)
  }

  test("true partition conflict fails loudly naming the partition and " +
    "the branch commit") {
    val dir = freshLake()
    CommitLog.createBranch(spark, dir, "exp")
    val t = CommitLog.branchTarget(dir, "exp")
    // both sides REWRITE d0: main upserts k=10, branch deletes k=11
    CommitLog.upsert(spark,
      Seq((10L, 99L, "d0")).toDF("k", "v", "pd"), dir, Seq("k"), "pd")
    CommitLog.delete(spark, t, col("k") === 11L)
    val e = intercept[IllegalStateException](
      CommitLog.rebaseBranch(spark, dir, "exp"))
    assert(e.getMessage.contains("pd=d0"),
      s"conflict must name the partition: ${e.getMessage}")
    assert(e.getMessage.contains("both sides rewrote"))
    assert(e.getMessage.contains("delete"),
      s"conflict must name the branch commit's op: ${e.getMessage}")
    // nothing published: both sides still serve their own state
    assert(rows(dir).contains((10L, 99L)) && rows(dir).exists(_._1 == 11L))
    assert(!rows(t).exists(_._1 == 11L) && rows(t).contains((10L, 3L)))
  }

  test("a branch MoR delete (deletion vector) rebases onto main's " +
    "disjoint-partition churn") {
    val dir = freshLake()
    CommitLog.createBranch(spark, dir, "exp")
    val t = CommitLog.branchTarget(dir, "exp")
    // main rewrites d1 (k 100-119 upserted to v=50)
    (100L until 103L).foreach { k =>
      CommitLog.upsert(spark,
        Seq((k, 50L, "d1")).toDF("k", "v", "pd"), dir, Seq("k"), "pd")
    }
    // branch MoR-deletes in d0
    CommitLog.deleteVectors(spark, t, col("k") === 12L)
    val adopted = CommitLog.mergeBranch(spark, dir, "exp")
    val expected = (0L until 300L).filterNot(_ == 12L)
      .map(k => if (k >= 100L && k < 103L) (k, 50L) else (k, k % 7)).toSet
    assert(rows(dir) == expected)
    assert(adopted.dvs.nonEmpty, "the branch's deletion vector must ride")
    // stats manifest survives the merge: zone-map point scan still exact
    val (hit, _) = CommitLog.scanRange(spark, dir, "k", 0L, 5L)
    assert(hit.select($"k").as[Long].collect().toSet == (0L to 5L).toSet)
  }

  test("the branch stays usable across merges: commit → merge → commit " +
    "→ merge again (fork marker resolves against the MAIN log)") {
    val dir = freshLake()
    CommitLog.createBranch(spark, dir, "exp")
    val t = CommitLog.branchTarget(dir, "exp")
    CommitLog.append(spark, Seq((9000L, 1L, "d0")).toDF("k", "v", "pd"), t)
    CommitLog.append(spark, Seq((8000L, 1L, "d1")).toDF("k", "v", "pd"), dir)
    CommitLog.mergeBranch(spark, dir, "exp")
    // round 2: more commits on both sides, then merge again
    CommitLog.append(spark, Seq((9001L, 2L, "d2")).toDF("k", "v", "pd"), t)
    CommitLog.delete(spark, t, col("k") === 13L) // d0 rewrite on branch
    CommitLog.append(spark, Seq((8001L, 2L, "d1")).toDF("k", "v", "pd"), dir)
    CommitLog.mergeBranch(spark, dir, "exp")
    val expected = (0L until 300L).filterNot(_ == 13L)
      .map(k => (k, k % 7)).toSet ++
      Set((9000L, 1L), (8000L, 1L), (9001L, 2L), (8001L, 2L))
    assert(rows(dir) == expected)
    assert(rows(t) == expected)
  }

  test("additive schema evolution on BOTH sides merges; rename on one " +
    "side with churn on the other fails loudly") {
    val dir = freshLake()
    CommitLog.createBranch(spark, dir, "exp")
    val t = CommitLog.branchTarget(dir, "exp")
    // branch appends with a new column mb; main appends with a new mm
    CommitLog.append(spark,
      Seq((9100L, 1L, "d0", 7L)).toDF("k", "v", "pd", "mb"), t)
    CommitLog.append(spark,
      Seq((9200L, 1L, "d1", 8L)).toDF("k", "v", "pd", "mm"), dir)
    CommitLog.mergeBranch(spark, dir, "exp")
    val merged = CommitLog.read(spark, dir)
    assert(Set("mb", "mm").subsetOf(merged.columns.toSet))
    assert(merged.filter($"k" === 9100L).select($"mb").as[Long]
      .head() == 7L)
    assert(merged.filter($"k" === 9200L).select($"mm").as[Long]
      .head() == 8L)

    // rename on the branch + schema change on main → loud failure
    val dir2 = freshLake()
    CommitLog.createBranch(spark, dir2, "exp")
    val t2 = CommitLog.branchTarget(dir2, "exp")
    CommitLog.renameColumn(spark, t2, "v", "val")
    CommitLog.append(spark,
      Seq((9300L, 1L, "d0", 9L)).toDF("k", "v", "pd", "mm"), dir2)
    val e = intercept[IllegalArgumentException](
      CommitLog.rebaseBranch(spark, dir2, "exp"))
    assert(e.getMessage.contains("renamed/dropped/re-typed"))
  }

  test("randomized interleave-then-rebase property: merged state equals " +
    "the model when branch rewrites stay on branch-only partitions") {
    for (seed <- Seq(7, 19, 41)) {
      val rnd = new scala.util.Random(seed)
      val dir = freshLake()
      CommitLog.createBranch(spark, dir, "p")
      val t = CommitLog.branchTarget(dir, "p")
      val model = scala.collection.mutable.Map[Long, Long]()
      (0L until 300L).foreach(k => model(k) = k % 7)
      var nextMain = 10000L
      var nextBranch = 20000L // branch-minted keys land in pd=d200
      (1 to 10).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 => // main append (clean by contract)
            val k = nextMain; nextMain += 1
            CommitLog.append(spark,
              Seq((k, k % 7, s"d${rnd.nextInt(3)}")).toDF("k", "v", "pd"),
              dir)
            model(k) = k % 7
          case 1 => // branch append into the branch-only partition
            val k = nextBranch; nextBranch += 1
            CommitLog.append(spark,
              Seq((k, k % 7, "d200")).toDF("k", "v", "pd"), t)
            model(k) = k % 7
          case 2 => // branch rewrite confined to the branch-only part
            if (nextBranch > 20000L) {
              val k = 20000L + rnd.nextInt((nextBranch - 20000L).toInt)
              CommitLog.upsert(spark,
                Seq((k, 777L, "d200")).toDF("k", "v", "pd"),
                t, Seq("k"), "pd")
              model(k) = 777L
            }
        }
      }
      CommitLog.mergeBranch(spark, dir, "p")
      assert(rows(dir) == model.map { case (k, v) => (k, v) }.toSet,
        s"seed $seed: merged main diverged from the model")
    }
  }

  test("versionAsOf through a branch: a timestamp between main's fork " +
    "commit and the branch's creation resolves to the fork version") {
    val dir = freshLake()
    CommitLog.append(spark, Seq((500L, 5L, "d0")).toDF("k", "v", "pd"), dir)
    val forkV = CommitLog.latest(spark, dir).get.version
    val forkTs = CommitLog.latest(spark, dir).get.committedAt
    Thread.sleep(15) // ensure creation stamp > fork commit stamp
    CommitLog.createBranch(spark, dir, "dev")
    val t = CommitLog.branchTarget(dir, "dev")
    val creationTs = CommitLog.latest(spark, t).get.committedAt
    assert(creationTs > forkTs, "fixture needs distinct stamps")
    // strictly between the two stamps: the fork's CONTENT existed —
    // resolution must find main's copy, not fall back to fork-1
    assert(CommitLog.versionAsOf(spark, t, creationTs - 1L) == forkV)
  }

  test("a literal '@' table path: trailing slash is the escape, and the " +
    "branch-parsed miss names it") {
    val base = Files.createTempDirectory("graft_at_").toString
    val dir = s"$base/events@2024"
    // create via the escape (trailing slash defeats the branch parse)
    spark.range(0, 10).select($"id".as("k"), ($"id" % 3).as("v"))
      .write.parquet(dir)
    CommitLog.init(spark, s"$dir/")
    assert(CommitLog.read(spark, s"$dir/").count() == 10L)
    // without the escape the target parses as branch '2024' of .../events
    // — the error must name the trailing-slash escape
    val e = intercept[IllegalStateException](CommitLog.read(spark, dir))
    assert(e.getMessage.contains("trailing slash"), e.getMessage)
  }

  test("SQL surface: CALL graft_branch_merge promotes a diverged branch") {
    val dir = freshLake()
    spark.sql(s"CALL graft_branch('$dir', 'sqlexp')")
    val t = CommitLog.branchTarget(dir, "sqlexp")
    CommitLog.append(spark, Seq((9500L, 1L, "d0")).toDF("k", "v", "pd"), t)
    CommitLog.append(spark, Seq((9600L, 1L, "d1")).toDF("k", "v", "pd"), dir)
    spark.sql(s"CALL graft_branch_merge('$dir', 'sqlexp')").collect()
    assert(rows(dir).contains((9500L, 1L)) && rows(dir).contains((9600L, 1L)))
  }

  /** The round-14 poison, killed by construction: a branch writer
    * racing mergeBranch's sync commit used to win the CAS, leaving a
    * stale fork marker that made the NEXT merge false-conflict against
    * its own adopted partition rewrite (recovery: re-fork). Now the
    * merge FENCES the branch first through the branch's own CAS domain:
    * every racing write either serializes BEFORE the fence (and is part
    * of the merged delta) or fails loudly at its commit. The property:
    * across randomized interleavings, no schedule ever needs a re-fork
    * — the second merge (with the dangerous rewritten-partition delta
    * adopted in the first) always succeeds, and every writer either
    * landed or got the loud fence error, never a silent drop. */
  test("FENCE property: racing branch writers land-before-fence or fail " +
    "loudly; no interleaving leaves the branch needing a re-fork") {
    for (seed <- Seq(11, 29, 47)) {
      val dir = freshLake()
      CommitLog.createBranch(spark, dir, "exp")
      val t = CommitLog.branchTarget(dir, "exp")
      // the dangerous shape: the branch REWRITES a partition (d2) so a
      // stale fork marker would false-conflict on the second merge
      CommitLog.delete(spark, t, col("k") === (200L + seed))
      // main advances, forcing a true rebase (not a bare fast-forward)
      CommitLog.append(spark,
        Seq((6000L + seed, 1L, "d0")).toDF("k", "v", "pd"), dir)
      val rnd = new scala.util.Random(seed)
      val delays = Array.fill(4, 3)(rnd.nextInt(60))
      val mergeDelay = rnd.nextInt(50)
      val landed = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val fencedOff = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
      val writers = (0 until 4).map { w =>
        pool.submit(new Runnable { def run(): Unit =
          (0 until 3).foreach { i =>
            val k = 8000L + seed * 10 + w * 3 + i
            Thread.sleep(delays(w)(i).toLong)
            // two terminal outcomes only — landed or loudly fenced; a
            // writer that exhausts its internal CAS retries under this
            // deliberately hostile schedule re-attempts (that is the
            // documented recovery and not the property under test)
            var attempts = 0
            var settled = false
            while (!settled) {
              try {
                CommitLog.append(spark,
                  Seq((k, 9L, "d1")).toDF("k", "v", "pd"), t)
                landed.add(k); settled = true
              } catch {
                case e: IllegalStateException
                  if e.getMessage.contains("FENCED for merge") =>
                  fencedOff.add(k); settled = true
                case e: IllegalStateException
                  if e.getMessage.contains("lost the commit race") &&
                    attempts < 20 =>
                  attempts += 1; Thread.sleep(30L)
              }
            }
          }
        })
      }
      Thread.sleep(mergeDelay.toLong)
      val adopted = CommitLog.mergeBranch(spark, dir, "exp")
      writers.foreach(_.get())
      pool.shutdown()
      // every attempt is accounted for: landed or loudly fenced
      assert(landed.size + fencedOff.size == 12,
        s"seed $seed: ${landed.size} landed + ${fencedOff.size} fenced")
      // the fence is gone and the branch is writable again
      val head = CommitLog.latest(spark, t).get
      assert(!head.props.contains(CommitLog.FenceProp),
        s"seed $seed: fence survived the merge")
      CommitLog.delete(spark, t, col("k") === (210L + seed))
      CommitLog.append(spark,
        Seq((6001L + seed, 2L, "d1")).toDF("k", "v", "pd"), dir)
      // the second merge — with the first's partition REWRITE adopted —
      // must never false-conflict, on any schedule
      CommitLog.mergeBranch(spark, dir, "exp")
      // model: base − the two deletes + main's appends + every landed
      // racing append (pre-fence ones adopted by merge 1, post-sync
      // ones by merge 2); a fenced-off write must NOT appear anywhere
      import scala.jdk.CollectionConverters._
      val expected = (0L until 300L)
        .filterNot(k => k == 200L + seed || k == 210L + seed)
        .map(k => (k, k % 7)).toSet ++
        Set((6000L + seed, 1L), (6001L + seed, 2L)) ++
        landed.asScala.map(k => (k, 9L))
      assert(rows(dir) == expected, s"seed $seed: merged main != model")
      assert(fencedOff.asScala.forall(k => !rows(dir).exists(_._1 == k)),
        s"seed $seed: a fenced-off write leaked into main")
    }
  }

  test("unfenceBranch clears a crashed merge's fence and the branch " +
    "writes again; a live merge whose fence was stolen fails loudly " +
    "instead of publishing a stale sync") {
    val dir = freshLake()
    CommitLog.createBranch(spark, dir, "exp")
    val t = CommitLog.branchTarget(dir, "exp")
    // simulate a crashed merge: stamp the fence via the merge's own
    // claim step, then never sync (the process "died" here)
    CommitLog.fenceBranch(spark, dir, "exp", "deadbeef@0")
    // fenced: every write verb refuses with the recovery in the message
    val e = intercept[IllegalStateException](CommitLog.append(spark,
      Seq((9000L, 1L, "d0")).toDF("k", "v", "pd"), t))
    assert(e.getMessage.contains("FENCED for merge") &&
      e.getMessage.contains("unfenceBranch"), e.getMessage)
    val e2 = intercept[IllegalStateException](
      CommitLog.setProps(spark, t, Map("a" -> "b")))
    assert(e2.getMessage.contains("FENCED for merge"))
    // a standalone rebase is a branch write too — refused while fenced
    CommitLog.append(spark, Seq((9100L, 1L, "d0")).toDF("k", "v", "pd"), dir)
    val e3 = intercept[IllegalStateException](
      CommitLog.rebaseBranch(spark, dir, "exp"))
    assert(e3.getMessage.contains("FENCED for merge"))
    // the triage surface shows the fence: branch report flags it
    val fencedCol = spark.sql(
      s"SELECT branch, fenced FROM graft_lake_branch_report('$dir')")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(fencedCol("exp"), "branch report must flag the fenced branch")
    // recovery: unfence (via the SQL verb), then write and merge normally
    spark.sql(s"CALL graft_branch_unfence('$dir', 'exp')").collect()
    val cleared = CommitLog.latest(spark, t).get
    assert(!cleared.props.contains(CommitLog.FenceProp))
    assert(!spark.sql(
      s"SELECT fenced FROM graft_lake_branch_report('$dir')")
      .collect().exists(_.getBoolean(0)), "report must clear the flag")
    CommitLog.append(spark, Seq((9000L, 1L, "d0")).toDF("k", "v", "pd"), t)
    CommitLog.mergeBranch(spark, dir, "exp")
    assert(rows(dir).contains((9000L, 1L)))
    assert(CommitLog.unfenceBranch(spark, dir, "exp").props
      .get(CommitLog.FenceProp).isEmpty) // no-op on an unfenced branch
  }

  test("SELF-HEALING merge recovery: a merge killed between adoption " +
    "and sync leaves the branch fenced — re-running mergeBranch " +
    "finishes the sync itself, no unfence, no re-fork") {
    val dir = freshLake()
    CommitLog.createBranch(spark, dir, "exp")
    val t = CommitLog.branchTarget(dir, "exp")
    // main advances; branch diverges
    CommitLog.append(spark, Seq((5000L, 1L, "d0")).toDF("k", "v", "pd"), dir)
    CommitLog.append(spark, Seq((7000L, 3L, "d1")).toDF("k", "v", "pd"), t)
    // the dead merge, reproduced from its own internals and killed
    // right before the sync commit: fence, rebase under the fence,
    // adopt into main — then nothing
    val epoch = "dead0001@0"
    CommitLog.fenceBranch(spark, dir, "exp", epoch)
    CommitLog.rebaseBranch(spark, dir, "exp", Some(epoch))
    val adopted = CommitLog.fastForward(spark, dir, "exp")
    // the branch is fenced: a plain write refuses with the recovery
    intercept[IllegalStateException](CommitLog.append(spark,
      Seq((1L, 1L, "d0")).toDF("k", "v", "pd"), t))
    val mainBefore = CommitLog.latest(spark, dir).get.version
    // re-running the SAME CALL heals: the sync completes, the adoption
    // is returned, and main takes NO second adoption
    val healed = CommitLog.mergeBranch(spark, dir, "exp")
    assert(healed.version == adopted.version)
    assert(CommitLog.latest(spark, dir).get.version == mainBefore,
      "self-heal must not re-adopt into main")
    val head = CommitLog.latest(spark, t).get
    assert(!head.props.contains(CommitLog.FenceProp),
      "the healing sync must clear the fence")
    assert(head.props("graft.branch.fork").toLong == adopted.version,
      "the healed branch must carry the adopted fork marker")
    // fully usable: a branch write and a NORMAL second merge both flow
    CommitLog.append(spark, Seq((7001L, 4L, "d0")).toDF("k", "v", "pd"), t)
    CommitLog.mergeBranch(spark, dir, "exp")
    assert(rows(dir).contains((7001L, 4L)))
  }

  test("a branch violated THROUGH the fence never self-heals: " +
    "mergeBranch stays loud (content-complete adoption detection)") {
    val dir = freshLake()
    CommitLog.createBranch(spark, dir, "exp")
    val t = CommitLog.branchTarget(dir, "exp")
    CommitLog.append(spark, Seq((5000L, 1L, "d0")).toDF("k", "v", "pd"), dir)
    CommitLog.append(spark, Seq((7000L, 3L, "d1")).toDF("k", "v", "pd"), t)
    val epoch = "dead0002@0"
    CommitLog.fenceBranch(spark, dir, "exp", epoch)
    CommitLog.rebaseBranch(spark, dir, "exp", Some(epoch))
    CommitLog.fastForward(spark, dir, "exp")
    // a stale-code writer (no assertUnfenced in its code path) lands a
    // commit through the live fence — the branch head no longer matches
    // the adoption, so self-heal must NOT legitimize it
    CommitLog.commitStaleBypassingFence(spark, t, "storm.violator", "1")
    val e = intercept[IllegalStateException](
      CommitLog.mergeBranch(spark, dir, "exp"))
    assert(e.getMessage.contains("FENCED"), e.getMessage)
  }
}

package graft.text

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.sources.CommitLog

/** [[InvertedIndex]]: index-serving must equal the corpus-pass scorer
  * bit for bit (the DuckDB numeric parity itself is pinned by q160's
  * hash-matched oracle — the same SQL as q139), the posting read must
  * actually prune files on a clustered layout, and serving must never
  * touch the corpus.
  */
class InvertedIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    s"$d/index"
  }

  private def corpus = Seq(
    (1L, "spark spark spark filter"),
    (2L, "spark filter join hash merge window"),
    (3L, "filter join hash merge row scan"),
    (4L, "spark spark filter join hash merge row scan batch value"),
    (5L, ""), // token-free doc: absent from postings AND from n/avglen
    (6L, "window window row")
  ).toDF("doc_id", "text")

  private def queriesDf = Seq(
    (0L, "spark", 0), (0L, "window", 1), (0L, "merge", 2),
    (1L, "row", 0), (1L, "scan", 1),
    (2L, "filter", 0), (2L, "absentterm", 1)
  ).toDF("query_id", "term", "pos")

  test("index serving ≡ corpus-pass batch scorer, bit for bit") {
    val dir = tmp("graft_invidx_parity_")
    InvertedIndex.build(spark, corpus, "doc_id", "text", dir, numFiles = 3)
    val viaIndex = InvertedIndex.search(spark, dir, queriesDf, k = 10, arity = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaCorpus = Retrieval
      .bm25Batch(corpus, queriesDf, "doc_id", "text", k = 10, arity = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // identical tf/len/df/n and the same IEEE op order → equality, not
    // tolerance
    assert(viaIndex == viaCorpus, s"\nindex:  $viaIndex\ncorpus: $viaCorpus")
  }

  test("globals exclude token-free docs, match the corpus-pass population") {
    val dir = tmp("graft_invidx_globals_")
    InvertedIndex.build(spark, corpus, "doc_id", "text", dir, numFiles = 2)
    val props = CommitLog.latest(spark, dir).get.props
    assert(props("bm25.n").toLong == 5L, "doc 5 (no tokens) must not count")
    assert(props("bm25.sumlen").toLong == (4 + 6 + 6 + 10 + 3))
  }

  test("term Bloom pruning engages on the range-clustered postings") {
    // 16 disjoint vocabularies over 8 posting files: any single term's
    // postings live in one range file, so a one-term probe must open a
    // strict subset
    val docs = (0 until 400).map { i =>
      val w = f"w${i / 25}%02d"
      (i.toLong, s"$w $w common$w")
    }.toDF("doc_id", "text")
    val dir = tmp("graft_invidx_prune_")
    InvertedIndex.build(spark, docs, "doc_id", "text", dir, numFiles = 8)
    val (posts, (read, total)) =
      CommitLog.scanPointsIn(spark, dir, "term", Seq("w03"))
    assert(total >= 4, s"fixture produced too few posting files ($total)")
    assert(read < total, s"no pruning: read $read of $total")
    assert(posts.count() == 25L, "pruned read lost or duplicated postings")
  }

  test("the postings log is the serving plan's only file scan") {
    // the registered q160's corpus-never-scanned pin lives in
    // PlanAuditSpec (there the corpus IS a parquet table); here: every
    // file scan in the serving plan reads the index directory
    val dir = tmp("graft_invidx_plan_")
    InvertedIndex.build(spark, corpus, "doc_id", "text", dir, numFiles = 2)
    val plan = InvertedIndex.search(spark, dir, queriesDf, k = 5, arity = 3)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("graft_invidx_plan_"), s"postings not scanned:\n$plan")
  }

  test("incremental update ≡ rebuild from the post-update corpus, bit for bit") {
    val dir = tmp("graft_invidx_update_")
    InvertedIndex.build(spark, corpus, "doc_id", "text", dir, numFiles = 3)
    // edit 2, add 7, delete 6 (token-free new text removes it)
    val changes = Seq(
      (2L, "window window spark merge"),
      (7L, "spark row scan scan"),
      (6L, "")
    ).toDF("doc_id", "text")
    InvertedIndex.update(spark, dir, changes)
    val updatedCorpus = corpus.filter(!col("doc_id").isin(2L, 6L, 7L))
      .unionByName(changes.filter(col("doc_id") =!= 6L))
    val rebuilt = tmp("graft_invidx_rebuilt_")
    InvertedIndex.build(spark, updatedCorpus, "doc_id", "text", rebuilt,
      numFiles = 3)
    def results(d: String) =
      InvertedIndex.search(spark, d, queriesDf, k = 10, arity = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(results(dir) == results(rebuilt))
    // the globals moved atomically WITH the postings, in one commit
    val props = CommitLog.latest(spark, dir).get.props
    assert(props("bm25.n").toLong == 5L, "2 edited, 1 added, 1 removed → 5")
    assert(props("bm25.sumlen").toLong == (4 + 4 + 6 + 10 + 4))
    // re-applying the identical update is a pure no-op on the scores
    InvertedIndex.update(spark, dir, changes)
    assert(results(dir) == results(rebuilt), "update is not idempotent")
    assert(CommitLog.latest(spark, dir).get.props == props)
  }

  test("update's old-postings probe is Bloom-pruned, not a full index scan") {
    val docs = (0 until 400).map { i =>
      val w = f"w${i / 25}%02d"
      (i.toLong, s"$w $w common$w")
    }.toDF("doc_id", "text")
    val dir = tmp("graft_invidx_updprune_")
    InvertedIndex.build(spark, docs, "doc_id", "text", dir, numFiles = 8)
    val (_, (read, total)) =
      CommitLog.scanPointsIn(spark, dir, "doc_id", Seq(42L))
    assert(read < total, s"doc probe read $read of $total files")
  }

  test("clustered compaction restores pruning after update churn; results unchanged") {
    val docs = (0 until 400).map { i =>
      val w = f"w${i / 25}%02d"
      (i.toLong, s"$w $w common$w")
    }.toDF("doc_id", "text")
    val dir = tmp("graft_invidx_compact_")
    InvertedIndex.build(spark, docs, "doc_id", "text", dir, numFiles = 8)
    // churn: re-text 40 docs across vocab ranges — each update lands its
    // postings as one unclustered file, degrading term locality
    (0 until 4).foreach { r =>
      val changed = (0 until 400 by 40).map { i =>
        ((i + r).toLong, f"w${(i + r) / 25}%02d edited$r")
      }.toDF("doc_id", "text")
      InvertedIndex.update(spark, dir, changed)
    }
    val q = Seq((0L, "w03", 0)).toDF("query_id", "term", "pos")
    val before = InvertedIndex.search(spark, dir, q, k = 30, arity = 1)
      .collect().map(_.toSeq).toSeq
    val (_, (readBefore, totalBefore)) =
      CommitLog.scanPointsIn(spark, dir, "term", Seq("w03"))
    CommitLog.compactClustered(spark, dir, targetPartitions = 8,
      clusterCols = Seq("term"))
    val (_, (readAfter, totalAfter)) =
      CommitLog.scanPointsIn(spark, dir, "term", Seq("w03"))
    assert(totalAfter <= totalBefore, "compaction did not shrink the file count")
    assert(readAfter < totalAfter, s"no pruning after compaction: $readAfter/$totalAfter")
    assert(readAfter <= readBefore,
      s"compaction worsened the probe: $readBefore -> $readAfter")
    val after = InvertedIndex.search(spark, dir, q, k = 30, arity = 1)
      .collect().map(_.toSeq).toSeq
    assert(after == before, "compaction changed search results")
  }

  test("searchAll keeps only docs matching EVERY query term; scores unchanged") {
    val dir = tmp("graft_invidx_and_")
    InvertedIndex.build(spark, corpus, "doc_id", "text", dir, numFiles = 2)
    val q = Seq((0L, "spark", 0), (0L, "window", 1))
      .toDF("query_id", "term", "pos")
    val any = InvertedIndex.search(spark, dir, q, k = 10, arity = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val all = InvertedIndex.searchAll(spark, dir, q, k = 10, arity = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // only doc 2 holds both "spark" and "window"
    assert(all.keySet == Set(2L), s"AND returned ${all.keySet}")
    assert(all(2L) == any(2L), "AND mode changed the BM25 score")
    assert(any.keySet.size > 1, "fixture: OR mode should match more docs")
  }

  test("a probe for terms absent from the corpus returns empty, not error") {
    val dir = tmp("graft_invidx_absent_")
    InvertedIndex.build(spark, corpus, "doc_id", "text", dir, numFiles = 2)
    val q = Seq((0L, "zzzzz", 0)).toDF("query_id", "term", "pos")
    assert(InvertedIndex.search(spark, dir, q, k = 5, arity = 1).count() == 0L)
  }

  test("an empty (or all-null-term) query batch returns empty, not error") {
    val dir = tmp("graft_invidx_emptyq_")
    InvertedIndex.build(spark, corpus, "doc_id", "text", dir, numFiles = 2)
    val empty = Seq.empty[(Long, String, Int)].toDF("query_id", "term", "pos")
    val got = InvertedIndex.search(spark, dir, empty, k = 5, arity = 1)
    assert(got.count() == 0L)
    assert(got.columns.toSeq == Seq("query_id", "doc_id", "score"))
    val nulls = Seq((0L, null.asInstanceOf[String], 0))
      .toDF("query_id", "term", "pos")
    assert(InvertedIndex.searchAll(spark, dir, nulls, k = 5, arity = 1)
      .count() == 0L)
  }

  test("build is crash-atomic: postings AND globals land in ONE commit") {
    val dir = tmp("graft_invidx_atomic_")
    InvertedIndex.build(spark, corpus, "doc_id", "text", dir, numFiles = 2)
    val snap = CommitLog.latest(spark, dir).get
    assert(snap.version == 1L,
      s"bootstrap took ${snap.version} commits — the init+setProps crash " +
        "window is back")
    assert(snap.props.contains("bm25.n") && snap.props.contains("bm25.sumlen"))
  }

  test("repairProps restores a props-less log; update then proceeds") {
    val dir = tmp("graft_invidx_repair_")
    InvertedIndex.build(spark, corpus, "doc_id", "text", dir, numFiles = 2)
    val healthy = CommitLog.latest(spark, dir).get.props
    // simulate the pre-one-commit crash residue: strip the bm25 props by
    // rewriting the version file without them (test-only surgery)
    val logDir = new java.io.File(s"$dir/_graft_log")
    val vf = logDir.listFiles.filter(_.getName.endsWith(".json")).maxBy(_.getName)
    val txt = new String(java.nio.file.Files.readAllBytes(vf.toPath))
    val stripped = txt.replaceAll(
      """"props":\{[^}]*\}""", """"props":{}""")
    java.nio.file.Files.write(vf.toPath, stripped.getBytes)
    // drop the local-FS checksum sidecar the out-of-band rewrite broke
    new java.io.File(logDir, s".${vf.getName}.crc").delete()
    assert(!CommitLog.latest(spark, dir).get.props.contains("bm25.n"))
    intercept[IllegalStateException] {
      InvertedIndex.update(spark, dir,
        Seq((1L, "patched text")).toDF("doc_id", "text"))
    }
    InvertedIndex.repairProps(spark, dir, "doc_id", "text")
    val repaired = CommitLog.latest(spark, dir).get.props
    assert(repaired("bm25.n") == healthy("bm25.n") &&
      repaired("bm25.sumlen") == healthy("bm25.sumlen"),
      "repair did not land on the original globals")
    InvertedIndex.update(spark, dir,
      Seq((1L, "patched text")).toDF("doc_id", "text"))
    assert(CommitLog.latest(spark, dir).get.props("bm25.n").toLong == 5L)
  }

  test("update aborts loudly when a commit lands between its snapshot " +
      "read and its own commit (stale-globals race)") {
    val dir = tmp("graft_invidx_race_")
    InvertedIndex.build(spark, corpus, "doc_id", "text", dir, numFiles = 2)
    val snap = CommitLog.latest(spark, dir).get
    // another writer's commit lands first (any props commit bumps the
    // version): our update derived absolute globals from `snap` and must
    // now refuse to publish them
    CommitLog.setProps(spark, dir, Map("other" -> "writer"))
    intercept[IllegalStateException] {
      CommitLog.replaceWhere(spark, dir,
        col("doc_id") === 1L,
        CommitLog.read(spark, dir).limit(0),
        propsDelta = Map("bm25.n" -> "999"),
        expectedVersion = Some(snap.version))
    }
    // the table is untouched by the aborted commit
    assert(CommitLog.latest(spark, dir).get.props("bm25.n").toLong == 5L)
  }
}

package graft.plans

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.TestSpark
import graft.runtime.Lifetime

/** Plan-shape regression guards: the properties SCALE.md claims must stay
  * true in the optimized plans, not just in prose.
  */
class PlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // Constructing q46/q131 plans EXECUTES IvfIndex.build / PqIndex.build
  // (eager cache + count); release those caches so later suites in the
  // shared session don't inherit this suite's block-manager residue.
  override def afterAll(): Unit = Lifetime.releaseAll(spark, blocking = true)

  private def planOf(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.queryExecution.executedPlan.toString()
  }

  test("q2: filters pushed to the parquet scan, projection pruned") {
    val p = planOf("q2_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_discount)"),
      s"filters not pushed:\n$p")
    assert(p.contains("GreaterThan(l_quantity,45.0)"))
    // 5 of 11 lineitem columns read (toString truncates the tail)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double"))
    assert(!p.contains("l_shipdate"), "unprojected column leaked into the scan")
  }

  test("q3: every dimension joins as broadcast-hash, no shuffle joins") {
    val p = planOf("q3_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, s"expected 3 broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$p")
  }

  test("q1: partial+final hash aggregation (map-side combine)") {
    val p = planOf("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q18: global top-n compiles to TakeOrderedAndProject") {
    val p = planOf("q18_topn_limit")
    assert(p.contains("TakeOrderedAndProject"), s"full sort instead of top-n:\n$p")
  }

  test("q53: deterministic split is a pure projection — zero exchanges") {
    val p = planOf("q53_split")
    // the only exchange allowed is the one backing the final orderBy
    val body = p.split("Sort ").head
    assert(!body.contains("Exchange hashpartitioning"),
      s"split introduced a shuffle:\n$p")
  }

  test("q55: eval gram set broadcasts; corpus side never shuffles") {
    val p = planOf("q55_contamination")
    assert(p.contains("BroadcastHashJoin"), s"gram join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"contamination fell back to SMJ:\n$p")
  }

  test("q67: quantization is explode-over-scan — zero pre-sort exchanges") {
    val p = planOf("q67_quantize")
    // max|e| is an array expression before the explode; only the output
    // orderBy may exchange (a window max would add exchange+sort here)
    val body = p.split("Sort ").head
    assert(!body.contains("Exchange hashpartitioning"),
      s"quantize introduced a shuffle:\n$p")
    assert(!body.contains("Window"), s"quantize fell back to a window:\n$p")
  }

  test("q63: boilerplate gram counts aggregate map-side before the exchange") {
    val p = planOf("q63_boilerplate")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    // round-17: per-doc RLE makes count(DISTINCT doc_id) a plain count —
    // exactly ONE data exchange (keyed on gram), no Expand, and the scan
    // prunes to the text column alone
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"q63 regressed to the two-exchange distinct aggregate:\n$p")
    assert(!p.contains("Expand"), s"q63 reintroduced Expand:\n$p")
  }

  test("q62: repetition signals are a pure scan projection — zero " +
      "exchanges before the output sort") {
    val p = planOf("q62_repetition")
    val body = p.split("Sort ").head
    assert(!body.contains("Exchange hashpartitioning"),
      s"q62 reintroduced a shuffle (top-count join-back?):\n$p")
    assert(!p.contains("Join"), s"q62 reintroduced the top-count join:\n$p")
  }

  test("q64: sliding windows expand rows, aggregate partial+final") {
    val p = planOf("q64_sliding_window")
    assert(p.contains("Expand"), s"no window expansion:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q85: gapfill is agg + ONE window exchange + generate — no grid join") {
    val p = planOf("q85_gapfill")
    assert(!p.contains("Join"), s"gapfill reintroduced the grid join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected exactly agg+window exchanges:\n$p")
    assert("Generate".r.findAllIn(p).size == 1, s"expected one explode:\n$p")
  }

  test("q93: trend dims broadcast, power sums aggregate partial+final") {
    val p = planOf("q93_trend")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, s"dims not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"trend fell back to SMJ:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q96: both weighted-median windows share ONE shuffle") {
    val p = planOf("q96_weighted_median")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"windows did not share the per-flag partitioning:\n$p")
    assert("Window".r.findAllIn(p).size == 2, s"expected cum+tot windows:\n$p")
  }

  test("q97: IN-subquery decorrelates to broadcast left-semi + top-n") {
    val p = planOf("q97_sql_bigcust")
    assert(p.contains("LeftSemi"), s"IN subquery not decorrelated:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"full sort for LIMIT:\n$p")
  }

  test("q109: both OHLC windows and the bar aggregation share ONE shuffle") {
    val p = planOf("q109_ohlc")
    // one hash exchange for (user, bucket); the only other exchange
    // backs the final global orderBy
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"ohlc windows/agg did not share the (key,bucket) partitioning:\n$p")
    assert("Window".r.findAllIn(p).size == 2, s"expected asc+desc windows:\n$p")
  }

  test("q121: prefix-filtered jaccard joins are all equi — never nested-loop") {
    val p = planOf("q121_jaccard_prefix")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"prefix blocking degenerated to a cross product:\n$p")
  }

  test("q126: A/B window runs over the aggregated variant table, not events") {
    val p = planOf("q126_ab_lift")
    val winFirst = p.indexOf("Window")
    assert(winFirst >= 0, s"no window in plan:\n$p")
    // below the window: the per-variant AND per-entity aggregations —
    // i.e. the window's input is the 2-row table, never the event scan
    val below = p.substring(winFirst)
    assert("HashAggregate".r.findAllIn(below).size >= 3,
      s"window input not pre-aggregated:\n$p")
  }

  // Pins for the round-4 bench-regressed set: their plans were healthy
  // (the regression was session state); keep them that way so a future
  // slowdown shows up as a plan diff, not just a timing.

  test("q6: tiny-dim cross join broadcasts one side — never a shuffled product") {
    val p = planOf("q6_cross_join")
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("Cross"),
      s"cross join lost its broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"shuffled cartesian appeared:\n$p")
  }

  test("q9: per-key top-k is ONE window exchange over the pre-filtered scan") {
    val p = planOf("q9_window_topk")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"extra shuffles around the rank window:\n$p")
    assert("Window \\[".r.findAllIn(p).size == 1, s"expected one rank window:\n$p")
    // rank ≤ k prunes per-partition BEFORE the shuffle (Spark 3.5+ group limit)
    assert(p.contains("WindowGroupLimit"), s"top-k filter not pushed:\n$p")
  }

  test("q73: counted multiset setops fold — no row replication, no second exchange") {
    val p = planOf("q73_setops_all")
    // FoldCountOverReplicateRows: count-per-key over EXCEPT ALL /
    // INTERSECT ALL becomes sum(multiplicity) over the rewrite's
    // pre-replication aggregate — the replicated multiset (O(Σ counts)
    // rows at 100 TB) never exists in the plan
    assert(!p.contains("Generate"), s"setop count kept its ReplicateRows:\n$p")
    // per branch: one exchange for the multiplicity aggregate, which the
    // folded count reuses; plus the final sort = 3 exchanges total
    assert("Exchange".r.findAllIn(p).size <= 3,
      s"folded setop grew extra exchanges:\n$p")
  }

  test("q138: sum/avg over EXCEPT ALL fold — Generate-free, no extra exchange") {
    val p = planOf("q138_setop_sums")
    // the generalized fold: sum(x)→sum(x·m), avg(x)→Σx·m/Σm over the
    // pre-replication aggregate — same no-materialization guarantee as
    // the q73 count fold
    assert(!p.contains("Generate"), s"setop sum kept its ReplicateRows:\n$p")
    // the folded plan reads: multiplicity aggregate → m>0 filter →
    // weighted sums. Exchanges: multiplicity agg keys, the outer
    // group-by (l_returnflag is a strict SUBSET of the setop keys, so
    // unlike q73 it cannot reuse that partitioning), and the final sort
    assert("Exchange".r.findAllIn(p).size <= 3,
      s"folded setop sums grew extra exchanges:\n$p")
    // the weighted shape itself: sum(qty · multiplicity) for sum/avg's
    // numerator and a null-guarded multiplicity sum for avg's denominator
    assert("sum\\(\\(qty#\\d+L \\* sum#\\d+L\\)\\)".r.findFirstIn(p).isDefined,
      s"multiplicity-weighted sum missing:\n$p")
    assert("sum\\(if \\(isnull\\(qty#\\d+L\\)\\) 0 else sum#\\d+L\\)".r.findFirstIn(p).isDefined,
      s"null-guarded avg denominator missing:\n$p")
  }

  test("q78: TPC-H volume-shipping joins stay all-broadcast — zero SMJ") {
    val p = planOf("q78_sql_volume")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 5,
      s"expected 5 broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$p")
  }

  test("q151: the declared dimension join is eliminated — no join, nation never scanned") {
    val p = planOf("q151_join_elim")
    assert(!p.contains("Join"), s"RI dim join survived optimization:\n$p")
    assert(!p.contains("nation.parquet"), s"eliminated dim still scanned:\n$p")
    // what remains is the fact-only aggregate with the key's null filter
    // pushed into the customer scan
    assert(p.contains("PushedFilters: [IsNotNull(c_nationkey)]"),
      s"fk null-filter not pushed to the scan:\n$p")
  }

  test("q155: aggregate over the base lake is answered from the materialized view — base never scanned") {
    val p = planOf("q155_view_rewrite")
    assert(p.contains("/view"), s"scan not routed to the view:\n$p")
    assert(!p.contains("/base"), s"base lake still scanned:\n$p")
  }

  test("q158: the delta-maintained cross-partition view serves the aggregate — base never scanned") {
    val p = planOf("q158_delta_view")
    assert(p.contains("/view"), s"scan not routed to the view:\n$p")
    assert(!p.contains("/base"), s"base lake still scanned:\n$p")
  }

  test("q159: star join composes away — no Join, no customer scan, view-routed aggregate") {
    val p = planOf("q159_star_view")
    assert(!p.contains("Join"), s"dim join survived the composition:\n$p")
    assert(!p.contains("customer.parquet"), s"eliminated dim still scanned:\n$p")
    assert(p.contains("/view"), s"aggregate not routed to the view:\n$p")
    assert(!p.contains("/base"), s"base lake still scanned:\n$p")
  }

  test("q156: the stream-maintained view serves the final aggregate — lake never scanned") {
    val p = planOf("q156_stream_view")
    assert(p.contains("/view"), s"scan not routed to the view:\n$p")
    assert(!p.contains("/lake"), s"base lake still scanned:\n$p")
  }

  test("q171: per-partition rollup reads ONLY the committed manifest — no lake data file in the plan") {
    val p = planOf("q171_meta_groupby")
    assert(p.contains("_graft_log"), s"scan not on the manifest:\n$p")
    assert(!p.contains("flag="), s"lake data files leaked into the plan:\n$p")
  }

  test("q175: distinct counts read ONLY the committed manifest — no lake data file in the plan") {
    val p = planOf("q175_meta_distinct")
    assert(p.contains("_graft_log"), s"scan not on the manifest:\n$p")
    assert(!p.contains("flag="), s"lake data files leaked into the plan:\n$p")
  }

  test("q160: index serving never scans the corpus — postings only, broadcast query side") {
    val p = planOf("q160_index_search")
    assert(!p.contains("documents"), s"corpus scanned at serving time:\n$p")
    assert(p.contains("graft_q160_"), s"postings log not scanned:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"query-side join fell back to SMJ:\n$p")
  }

  test("q86: z-order bucketing is one interleave window + one agg — two exchanges") {
    val p = planOf("q86_zorder")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"z-order plan grew extra shuffles:\n$p")
  }

  test("q87: SCD2 change detection shares one per-key shuffle across both windows") {
    val p = planOf("q87_scd2")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"scd2 windows stopped sharing the per-key partitioning:\n$p")
    assert("Window".r.findAllIn(p).size == 2, s"expected lag+lead windows:\n$p")
  }

  test("q111: basket pairs are two exchanges and zero joins") {
    val p = planOf("q111_basket")
    // collect_set by basket + support count — pairs generate map-side
    // between them; the former self-join form is banned outright
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"basket mining grew extra shuffles:\n$p")
    assert(!p.contains("Join"), s"pair generation regressed to a join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-100 not pushed:\n$p")
  }

  test("q130: grid argmin is broadcast join + hash aggregation — no sorts, no SMJ") {
    val p = planOf("q130_geo_grid")
    assert(p.contains("BroadcastHashJoin"), s"cell join lost its broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"cell join fell back to SMJ:\n$p")
    // the final orderBy sorts 150k result rows; candidates must not sort
    assert(!p.contains("SortAggregate"),
      s"argmin regressed to struct-min SortAggregate:\n$p")
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2,
      s"expected partial+final heap aggregation:\n$p")
  }

  test("q74: decorrelated LATERAL ranks via WindowGroupLimit and joins broadcast") {
    val p = planOf("q74_lateral")
    // Catalyst must decorrelate the per-row LIMIT 1 into a group-limited
    // window (partial + final WindowGroupLimit), never a per-customer loop,
    // and the customer side must broadcast — the shape behind the 0.6 s
    // fresh-JVM steady state (SCALE.md round-6 note).
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"LATERAL lost the group-limit decorrelation:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"customer join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fell back to SMJ:\n$p")
    assert(!p.contains("CartesianProduct"), s"correlation exploded:\n$p")
  }

  // Whole-inventory product guard. A CartesianProduct is the shuffled
  // all-pairs operator — quadratic in BOTH inputs with no broadcast bound;
  // any query that acquires one at 100 TB is dead. A BroadcastNestedLoopJoin
  // is tolerable only when one side is provably dimension-sized, so it is
  // allowed solely for the queries whose SEMANTICS are all-pairs over a
  // bounded side (documented exactness baselines and tiny-dim matrices).
  // Every other registered query must stay equi-join/aggregation shaped.
  private val allPairsBySemantics = Set(
    "q6_cross_join",      // 5×25 dim task matrix — broadcast, 125 rows
    "q23_cosine_topk",    // broadcast PROBE set (5 vectors) × corpus scan
    "q38_range_join",     // BETWEEN join on a broadcast 3-row band dim
    "q68_jaccard_pairs",  // exact-Jaccard verification baseline (tiny ids)
    "q69_embed_neardup",  // all-pairs embedding baseline, capped at 300
    "q72_editdist",       // Levenshtein probe set, broadcast by design
    "q84_geo_nearest",    // brute-force haversine exactness baseline
    "q103_chi2",          // category-list densify (|A|×|B| cells, broadcast)
    "q115_sql_forecast",  // scalar-subquery single-row join
    "q126_ab_lift",       // variant×variant 1-row readout
    "q129_pmi",           // 1-row corpus-total aggregate joined to pairs
    "q135_constraints",   // 1-row table-total broadcast onto per-check rows
    "q136_bm25",          // 1-row corpus-constants broadcast onto per-doc rows
    "q139_bm25_batch",    // same 1-row corpus-constants broadcast as q136
    "q147_theta_setops",  // 5×5 broadcast pair readout over aggregated sketches
    "q149_corpus_card",   // 1-row card assembly (profile × langs × hitters)
    "q150_corpus_diff",   // 1-row totals broadcast onto the vocab join
    "q194_hybrid_rrf",    // inherits q139's 1-row corpus-constants
                          // broadcast + q23's 5-probe broadcast; the
                          // fusion join itself is a keyed full outer
    "q195_hard_negatives") // inherits q139's 1-row corpus-constants
                           // broadcast; the positives anti-join is equi

  test("no registered query plans a shuffled or unsanctioned all-pairs join") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = planOf(name)
      val cart = p.contains("CartesianProduct")
      val bnlj = p.contains("BroadcastNestedLoopJoin") &&
        !allPairsBySemantics.contains(name)
      if (cart) Some(s"$name: CartesianProduct (shuffled all-pairs)")
      else if (bnlj) Some(s"$name: BroadcastNestedLoopJoin outside the whitelist")
      else None
    }
    assert(offenders.isEmpty,
      s"scale-hostile join shapes:\n${offenders.mkString("\n")}")
  }

  test("q179: the CDF diff is one key-partitioned join over file-pruned scans, no cartesian") {
    val p = planOf("q179_lake_cdf")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"CDF pre/post diff must be a key-partitioned join:\n$p")
    assert(!p.contains("CartesianProduct"), s"CDF exploded:\n$p")
  }

  test("q196: the merged branch SERVES as a plain file-list scan + " +
    "partial/final aggregate — the rebase was metadata-plane, so no " +
    "merge machinery survives into the read plan") {
    val p = planOf("q196_branch_merge")
    assert(p.contains("HashAggregate"), s"q196 must aggregate:\n$p")
    assert(p.contains("Scan parquet"), s"q196 must scan lake files:\n$p")
    // one table, one aggregation — no join residue from the merge
    assert(!p.contains("Join"), s"merge residue leaked into serving:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q197: routed hybrid fusion never scans the corpus — both legs " +
    "read index tables, fused by one top-k-sized join + rank window") {
    val p = planOf("q197_hybrid_routed")
    assert(!p.contains("documents.parquet"),
      s"the lexical leg re-scanned the corpus:\n$p")
    assert(p.contains("FullOuter") || p.contains("full_outer") ||
      p.contains("FullOuterJoin") || p.contains("SortMergeJoin FullOuter"),
      s"RRF fusion must be the top-k full outer join:\n$p")
    assert(p.contains("Window") || p.contains("RunningWindowFunction"),
      s"fused rank must be a window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q198: the transactional family SERVES through manifest pins as " +
    "an ordinary two-lake join + aggregate — no txn machinery in the " +
    "read plan") {
    val p = planOf("q198_txn_append")
    assert(p.contains("Join"), s"q198 joins the family's two lakes:\n$p")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q198 join exploded:\n$p")
  }

  test("q199: routed hard negatives anti-join positives BROADCAST — " +
    "candidates come from the posting index, never the corpus") {
    val p = planOf("q199_negatives_routed")
    assert(!p.contains("documents.parquet"),
      s"the mine re-tokenized the corpus:\n$p")
    assert(p.contains("LeftAnti"), s"positives must anti-join away:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the label table must broadcast:\n$p")
  }

  test("q200: the purge+append transaction SERVES as an ordinary join " +
    "+ aggregate over the pinned family cut") {
    val p = planOf("q200_txn_delete")
    assert(p.contains("Join") && p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q200 join exploded:\n$p")
  }

  test("q201: the restate+append transaction SERVES as an ordinary " +
    "join + aggregate over the pinned family cut") {
    val p = planOf("q201_txn_restate")
    assert(p.contains("Join") && p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q201 join exploded:\n$p")
  }

  test("q202: the SQL-composed transaction SERVES through graft_txn_read " +
    "as an ordinary join + aggregate — the CALL leaves no residue in " +
    "the read plan") {
    val p = planOf("q202_txn_sql")
    assert(p.contains("Join") && p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q202 join exploded:\n$p")
  }

  test("q203: hybrid hard-negative mining reads both INDEXES, never the " +
    "corpus; positives anti-join away broadcast off the fused ranking") {
    val p = planOf("q203_negatives_hybrid")
    assert(!p.contains("documents.parquet"),
      s"the hybrid mine re-tokenized the corpus:\n$p")
    assert(p.contains("LeftAnti"), s"positives must anti-join away:\n$p")
    assert(p.contains("Window"), s"neg_rank must be a window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q204: the streaming fan-out family SERVES as two pinned-cut " +
    "aggregates joined on the partition key — no residue of the " +
    "per-trigger transaction machinery in the read plan") {
    val p = planOf("q204_stream_txn_fanout")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("Join"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q204 join exploded:\n$p")
  }

  test("q205: the HISTORICAL family cut (readAt t1, post plain-vacuum) " +
    "SERVES as an ordinary join + aggregate over the pinned snapshots") {
    val p = planOf("q205_txn_time_travel")
    assert(p.contains("Join") && p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q205 join exploded:\n$p")
  }

  test("q206: the cut-to-cut family diff is a keyed full-outer diff of " +
    "two pinned snapshots' touched partitions — churn-sized, never a " +
    "lake scan, no join explosion") {
    val p = planOf("q206_txn_changes")
    assert(p.contains("HashAggregate"), p)
    // churn-sized by construction: only the PURGED partition's files
    // enter the diff at either version — and because the post-image
    // side of that partition is empty after the purge, Catalyst folds
    // the keyed full-outer away entirely (empty-relation propagation):
    // the feed plan is a pruned scan of the pre-image partition, no
    // join at all. (The keyed FullOuter shape for a genuine update diff
    // is pinned in LakeTxnSpec's changesBetween test.)
    assert(p.contains("flag=F"),
      s"the touched partition must be read:\n$p")
    assert(!p.contains("flag=O") && !p.contains("flag=P"),
      s"untouched partitions leaked into the cut-to-cut diff:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q206 diff exploded:\n$p")
  }

  test("q181: graft_zorder stays inside WholeStageCodegen") {
    import org.apache.spark.sql.functions._
    import graft.tables.Tables
    val df = Tables.lineitem(spark, sf).select(
      graft.functions.NativeZorder.zorder(
        col("l_partkey"), col("l_suppkey")).as("z"))
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("*(1) Project"), s"zorder fell out of codegen:\n$p")
    df.collect() // the generated code compiles + runs
  }

  test("native dedup expressions run inside WholeStageCodegen") {
    import org.apache.spark.sql.functions._
    import graft.tables.Tables
    val df = Tables.documents(spark, sf)
      .select(graft.functions.NativeHashes.simhash64(col("text")).as("s"),
        graft.functions.NativeHashes.minhashSig(col("text")).as("m"))
    val p = df.queryExecution.executedPlan.toString()
    // "*(n)" prefixes mark WholeStageCodegen stages in executedPlan toString
    assert(p.contains("*(1) Project [graft_simhash64"), s"codegen collapsed:\n$p")
    df.collect() // and the generated code actually compiles + runs
  }
}

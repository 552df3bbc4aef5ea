package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SQL table-valued functions over [[CommitLog]] tables — the lake's
  * `spark.sql` front door:
  *
  * {{{
  *   SELECT o_orderstatus, count(*) FROM graft_lake('/lake/orders') GROUP BY 1
  *   SELECT * FROM graft_lake_at('/lake/orders', 3)        -- VERSION AS OF
  *   SELECT * FROM graft_lake_asof('/lake/orders', <ms>)   -- TIMESTAMP AS OF
  * }}}
  *
  * The builder resolves the snapshot at ANALYSIS time and splices the
  * already-analyzed read plan in, so everything downstream behaves
  * exactly like the DataFrame path: filters and projections push into
  * the pruned file scan, and [[graft.plans.RewriteAggregateOnView]]
  * routes matching SQL aggregates to a registered materialized view —
  * the SQL user gets the snapshot isolation and the optimizer surface
  * for free. Arguments must be literals (a path computed per row has no
  * meaning for a table function).
  */
object LakeTvf {

  private def strArg(name: String, e: Expression): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$name expects a literal string path, got: $other")
  }

  /** First argument of every lake TVF: a directory path OR a
    * catalog-qualified `cat.db.t` name ([[graft.catalog.GraftCatalog
    * .resolveTarget]]). */
  private def dirArg(name: String, e: Expression): String =
    graft.catalog.GraftCatalog.resolveTarget(
      SparkSession.active, strArg(name, e))

  private def longArg(name: String, e: Expression): Long = e match {
    case Literal(v, LongType) => v.asInstanceOf[Long]
    case Literal(v, IntegerType) => v.asInstanceOf[Int].toLong
    case other => throw new IllegalArgumentException(
      s"$name expects a literal integer, got: $other")
  }

  private def analyzed(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** (name, builder) triples for [[graft.functions.GraftExtensions]]. */
  def builders: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "graft_lake" -> { args =>
      require(args.size == 1, "graft_lake(dir)")
      analyzed(CommitLog.read(SparkSession.active,
        dirArg("graft_lake", args.head)))
    },
    "graft_lake_at" -> { args =>
      require(args.size == 2, "graft_lake_at(dir, version)")
      analyzed(CommitLog.readAt(SparkSession.active,
        dirArg("graft_lake_at", args.head),
        longArg("graft_lake_at", args(1))))
    },
    "graft_lake_asof" -> { args =>
      require(args.size == 2, "graft_lake_asof(dir, epochMillis)")
      analyzed(CommitLog.readAsOf(SparkSession.active,
        dirArg("graft_lake_asof", args.head),
        longArg("graft_lake_asof", args(1))))
    },
    "graft_lake_changes" -> { args =>
      require(args.size == 3, "graft_lake_changes(dir, fromV, toV)")
      analyzed(CommitLog.changesBetween(SparkSession.active,
        dirArg("graft_lake_changes", args.head),
        longArg("graft_lake_changes", args(1)),
        longArg("graft_lake_changes", args(2))))
    },
    "graft_lake_cdf" -> { args =>
      require(args.size == 4,
        "graft_lake_cdf(dir, fromV, toV, 'key1[,key2...]')")
      analyzed(CommitLog.changeFeed(SparkSession.active,
        dirArg("graft_lake_cdf", args.head),
        longArg("graft_lake_cdf", args(1)),
        longArg("graft_lake_cdf", args(2)),
        strArg("graft_lake_cdf", args(3)).split(",").toSeq.map(_.trim)))
    },
    "graft_lake_cdf_by_commit" -> { args =>
      require(args.size == 4,
        "graft_lake_cdf_by_commit(dir, fromV, toV, 'key1[,key2...]')")
      analyzed(CommitLog.changeFeedByCommit(SparkSession.active,
        dirArg("graft_lake_cdf_by_commit", args.head),
        longArg("graft_lake_cdf_by_commit", args(1)),
        longArg("graft_lake_cdf_by_commit", args(2)),
        strArg("graft_lake_cdf_by_commit", args(3))
          .split(",").toSeq.map(_.trim)))
    },
    "graft_lake_describe" -> { args =>
      require(args.size == 1, "graft_lake_describe(dir)")
      val s = SparkSession.active
      val schema = CommitLog.read(s,
        dirArg("graft_lake_describe", args.head)).schema
      import s.implicits._
      analyzed(schema.fields.toIndexedSeq
        .map(f => (f.name, f.dataType.simpleString, f.nullable))
        .toDF("col_name", "data_type", "nullable"))
    },
    "graft_lake_history" -> { args =>
      require(args.size == 1, "graft_lake_history(dir)")
      analyzed(CommitLog.history(SparkSession.active,
        dirArg("graft_lake_history", args.head)))
    },
    "graft_lake_files" -> { args =>
      require(args.size == 1, "graft_lake_files(dir)")
      analyzed(CommitLog.filesReport(SparkSession.active,
        dirArg("graft_lake_files", args.head)))
    },
    "graft_lake_branches" -> { args =>
      require(args.size == 1, "graft_lake_branches(dir)")
      val s = SparkSession.active
      analyzed(s.createDataFrame(
        CommitLog.listBranches(s, dirArg("graft_lake_branches", args.head)))
        .toDF("branch", "head_version"))
    },
    "graft_txn_read" -> { args =>
      // the family-consistent read at the SQL front door: resolve
      // `tableDir` through the LATEST transaction manifest's pin, so a
      // SQL reader can never see a torn multi-table cut (the Scala
      // twin is LakeTxn.read; q198/q200's serving shape)
      require(args.size == 2, "graft_txn_read(txnDir, tableDir)")
      // dirArg on BOTH: the table argument accepts a catalog-qualified
      // cat.db.t name like every other lake TVF's table argument
      analyzed(LakeTxn.read(SparkSession.active,
        dirArg("graft_txn_read", args.head),
        dirArg("graft_txn_read", args(1))))
    },
    "graft_txn_read_at" -> { args =>
      // time travel across FAMILY CUTS: resolve `tableDir` through the
      // pins of manifest sequence `txnSeq` — readable as far back as
      // vacuumManifests keeps cuts, because every retained manifest's
      // pins are enforced vacuum pin sources (LakeTxn.familyPins)
      require(args.size == 3, "graft_txn_read_at(txnDir, txnSeq, tableDir)")
      analyzed(LakeTxn.readAt(SparkSession.active,
        dirArg("graft_txn_read_at", args.head),
        longArg("graft_txn_read_at", args(1)),
        dirArg("graft_txn_read_at", args(2))))
    },
    "graft_txn_changes" -> { args =>
      // cut-to-cut CDC at the SQL front door: what changed in ONE
      // participant between two family cuts (the diff twin of
      // graft_txn_read_at) — keyCols as a comma list, like the
      // provider's CDC options
      require(args.size == 5,
        "graft_txn_changes(txnDir, fromCut, toCut, tableDir, 'k1[,k2…]')")
      val keys = strArg("graft_txn_changes", args(4)).split(",")
        .toSeq.map(_.trim).filter(_.nonEmpty)
      require(keys.nonEmpty,
        "graft_txn_changes: at least one key column required")
      analyzed(LakeTxn.changesBetween(SparkSession.active,
        dirArg("graft_txn_changes", args.head),
        longArg("graft_txn_changes", args(1)),
        longArg("graft_txn_changes", args(2)),
        dirArg("graft_txn_changes", args(3)), keys))
    },
    "graft_txn_families" -> { args =>
      // the participant-side view of family retention: which families
      // pin THIS table, at which versions — the queryable twin of the
      // vacuum dry-run's stderr report, so "why does my vacuum keep
      // version 7" is one SELECT
      require(args.size == 1, "graft_txn_families(tableDir)")
      val s = SparkSession.active
      import s.implicits._
      analyzed(LakeTxn.familyReport(s,
        dirArg("graft_txn_families", args.head))
        .flatMap { case (fam, vs) => vs.map(v => (fam, v)) }
        .toDF("family_dir", "pinned_version"))
    },
    "graft_txn_pins" -> { args =>
      // the family's current cut as rows: (table dir, pinned version,
      // that table's latest version) — the triage surface for "is a
      // participant drifting ahead of what readers see".
      // latest_version resolves through the manifest's `dirs` map (the
      // ORIGINAL dir the committer supplied), so it is exact on any
      // FileSystem — normalization strips scheme/authority from the
      // pin KEY, which therefore isn't a readable path off the default
      // filesystem. Manifests written before `dirs` existed fall back
      // to the key and read -1 where that key doesn't resolve
      // (pinned_version is always exact either way).
      require(args.size == 1, "graft_txn_pins(txnDir)")
      val s = SparkSession.active
      val txnDir = dirArg("graft_txn_pins", args.head)
      val st = LakeTxn.latest(s, txnDir).getOrElse(
        throw new IllegalArgumentException(
          s"$txnDir holds no transaction manifest"))
      import s.implicits._
      analyzed(st.pins.toSeq.sorted.map { case (d, v) =>
        (st.txn, d, v,
          (try CommitLog.latest(s, st.dirs.getOrElse(d, d)) catch {
            case _: Exception => None
          }).map(_.version).getOrElse(-1L))
      }.toDF("txn", "table_dir", "pinned_version", "latest_version"))
    },
    "graft_lake_branch_report" -> { args =>
      require(args.size == 1, "graft_lake_branch_report(dir)")
      analyzed(CommitLog.branchRetentionReport(SparkSession.active,
        dirArg("graft_lake_branch_report", args.head)))
    },
    "graft_lake_tag" -> { args =>
      require(args.size == 2, "graft_lake_tag(dir, name)")
      analyzed(LakeRefs.readTag(SparkSession.active,
        dirArg("graft_lake_tag", args.head),
        strArg("graft_lake_tag", args(1))))
    },
    "graft_lake_published" -> { args =>
      require(args.size == 1, "graft_lake_published(dir)")
      analyzed(LakeRefs.readPublished(SparkSession.active,
        dirArg("graft_lake_published", args.head)))
    },
    "graft_lake_tags" -> { args =>
      require(args.size == 1, "graft_lake_tags(dir)")
      val s = SparkSession.active
      analyzed(s.createDataFrame(
        LakeRefs.tags(s, dirArg("graft_lake_tags", args.head)))
        .toDF("tag", "version"))
    },
    "graft_lake_publish_history" -> { args =>
      require(args.size == 1, "graft_lake_publish_history(dir)")
      val s = SparkSession.active
      val rows = LakeRefs.publishHistory(s,
          dirArg("graft_lake_publish_history", args.head))
        .map { case (n, v) =>
          org.apache.spark.sql.Row(n, v.map(Long.box).orNull)
        }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("seq",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.LongType, nullable = true)))
      analyzed(s.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), schema))
    },
    "graft_lake_stats_by_partition" -> { args =>
      require(args.size >= 2,
        "graft_lake_stats_by_partition(dir, col, ...)")
      analyzed(CommitLog.statsAggByPartition(SparkSession.active,
        dirArg("graft_lake_stats_by_partition", args.head),
        args.tail.map(strArg("graft_lake_stats_by_partition", _))))
    },
    "graft_lake_distinct" -> { args =>
      // per-partition rollup when the table is hive-partitioned; the
      // GLOBAL manifest rollup otherwise — an unpartitioned lake must
      // not error out of the metadata plane (the Scala distinctAgg /
      // distinctAggByPartition split stays explicit for typed callers)
      require(args.size >= 2, "graft_lake_distinct(dir, col, ...)")
      val s = SparkSession.active
      val dir = dirArg("graft_lake_distinct", args.head)
      val cols = args.tail.map(strArg("graft_lake_distinct", _))
      val snap = CommitLog.latest(s, dir).getOrElse(
        throw new IllegalStateException(s"$dir has no commit log"))
      analyzed(
        if (CommitLog.partColsOf(snap).isEmpty) CommitLog.distinctAgg(s, dir, cols)
        else CommitLog.distinctAggByPartition(s, dir, cols))
    },
    "graft_lake_distinct_global" -> { args =>
      require(args.size >= 2, "graft_lake_distinct_global(dir, col, ...)")
      analyzed(CommitLog.distinctAgg(SparkSession.active,
        dirArg("graft_lake_distinct_global", args.head),
        args.tail.map(strArg("graft_lake_distinct_global", _))))
    })
}

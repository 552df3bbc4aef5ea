package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, StringType}

/** SQL DML bindings for [[CommitLog]] lakes — the mutation half of the
  * `spark.sql` front door ([[LakeTvf]] is the read half):
  *
  * {{{
  *   INSERT INTO graft_lake('/lake/orders') SELECT ...   -- pure append
  *   INSERT INTO graft_lake('/lake/orders') VALUES (...)
  *   DELETE FROM graft_lake('/lake/orders') WHERE o_custkey % 10 = 3
  *   DELETE FROM graft_lake('/lake/orders') WHERE flag = 'F'
  *     USING DELETION VECTORS                       -- merge-on-read
  *   UPDATE graft_lake('/lake/orders') SET o_totalprice = o_totalprice * 2
  *     WHERE o_orderkey <= 2000
  *   MERGE INTO graft_lake('/lake/orders') AS t
  *   USING (SELECT ...) AS s
  *   ON t.o_orderkey = s.o_orderkey
  *   WHEN MATCHED AND s.o_totalprice < 100 THEN DELETE
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  *   WHEN NOT MATCHED BY SOURCE THEN DELETE         -- opt-in full scan
  *   SELECT * FROM graft_lake('/lake/orders') VERSION AS OF 3
  *   SELECT * FROM graft_lake('/lake/orders') TIMESTAMP AS OF 1700000000000
  *   ALTER TABLE graft_lake('/lake/orders') ADD COLUMNS (note STRING)
  *   CALL graft_compact('/lake/orders', 4)
  *   CALL graft_vacuum('/lake/orders', 1)
  *   CALL graft_restore('/lake/orders', 3)
  *   CALL graft_tag('/lake/orders', 'audited', 3)
  *   CALL graft_publish('/lake/orders', 3)
  *   CALL graft_txn_write('/lake/_txn', 7,            -- atomic multi-
  *     'delete|/lake/orders|o_orderstatus = "F"',     -- table write
  *     'append|/lake/lineitem|staged_lineitem')       -- (LakeTxn)
  * }}}
  *
  * Implementation: the statements above are STANDARD Spark SQL grammar
  * except for the table-function target, the deletion-vector suffix, and
  * the time-travel suffix on a TVF. So the injected parser does minimal
  * text surgery — swap the `graft_lake('dir')` target for a placeholder
  * identifier, strip `USING DELETION VECTORS`, rewrite
  * `VERSION/TIMESTAMP AS OF` sugar into [[LakeTvf]]'s `graft_lake_at` /
  * `graft_lake_asof` — and hands the result to Spark's OWN parser, so
  * the full expression/clause grammar (conditions, assignments, nested
  * source queries) is Spark's, not a re-implementation. The parsed
  * `DeleteFromTable` / `UpdateTable` / `MergeIntoTable` plan is then
  * translated onto the [[CommitLog]] verbs (`delete`, `deleteVectors`,
  * `replaceWhere`, `merge`), which carry the MVCC commit, the rebase
  * rules, and the partition conflict unit — a SQL mutation is exactly a
  * Scala-API mutation.
  *
  * MERGE accepts ARBITRARY ordered clause chains — any number of
  * conditional `WHEN MATCHED` updates (whole-row `SET *` or
  * column-level `SET v = t.v + s.delta`) and deletes, any number of
  * conditional `WHEN NOT MATCHED` inserts (`INSERT *` or
  * `INSERT (cols) VALUES (exprs)`) — applied first-match-wins in
  * source order by [[CommitLog.mergeClauses]], exactly as SQL MERGE
  * specifies.
  *
  * Honest surface limits (all rejected loudly at parse time):
  *  - column-level clauses assign existing columns only (schema
  *    evolution needs a whole-row clause or ALTER TABLE), never the
  *    key/partition columns;
  *  - the merge ON clause must be a conjunction of `t.k = s.k` key
  *    equalities (that IS the engine's keyed-merge contract);
  *  - `WHEN NOT MATCHED BY SOURCE` supports DELETE only.
  */
object LakeSqlDml {

  /** `graft_lake('<dir>')` immediately after the DML verb — the TARGET
    * occurrence only, so `graft_lake` reads inside a merge SOURCE query
    * keep resolving through [[LakeTvf]]. */
  private val Target =
    """(?is)\b(MERGE\s+INTO|DELETE\s+FROM|UPDATE|INSERT\s+INTO|INSERT\s+OVERWRITE(?:\s+TABLE)?|ALTER\s+TABLE)\s+graft_lake\s*\(\s*'([^']+)'\s*\)""".r

  private val DvSuffix =
    """(?is)\s+USING\s+DELETION\s+VECTORS\s*;?\s*$""".r

  private val Call =
    """(?is)^\s*CALL\s+graft_(\w+)\s*\(\s*(.*?)\s*\)\s*;?\s*$""".r

  private val VersionAsOf =
    """(?is)graft_lake\s*\(\s*'([^']+)'\s*\)\s+VERSION\s+AS\s+OF\s+(\d+)""".r

  private val TimestampAsOf =
    """(?is)graft_lake\s*\(\s*'([^']+)'\s*\)\s+TIMESTAMP\s+AS\s+OF\s+(\d+|'[^']+')""".r

  private[sources] val Placeholder = "graft_dml_target_"

  /** Is `offset` inside a SQL string literal OR a SQL comment? Scans
    * the prefix tracking quote state for BOTH literal forms Spark
    * accepts (`'...'` and `"..."`), honoring backslash escapes (a
    * doubled quote (`''`) toggles out and straight back in, which still
    * reads as inside-the-literal at any offset strictly within it), plus
    * `--` line comments and slash-star block comments — a quote inside a
    * comment opens no literal and vice versa. Guards every regex below
    * from misrouting a statement whose string LITERAL or COMMENT
    * happens to contain DML-shaped text
    * (`SELECT 'DELETE FROM graft_lake(...)'`,
    * `SELECT 1 -- UPDATE t SET ...`). */
  private[sources] def inLiteral(sql: String, offset: Int): Boolean = {
    var i = 0
    var q: Char = 0       // 0 = outside; '\'' or '"' = inside that literal
    var lineC = false     // inside a `--` comment (to end of line)
    var blockC = false    // inside a `/* */` comment
    def nxt(c: Char): Boolean = i + 1 < sql.length && sql.charAt(i + 1) == c
    while (i < offset) {
      val c = sql.charAt(i)
      if (lineC) { if (c == '\n') lineC = false }
      else if (blockC) {
        if (c == '*' && nxt('/')) { blockC = false; i += 1 }
      } else if (q != 0) {
        if (c == '\\') i += 1 // escaped char inside a literal
        else if (c == q) q = 0
      } else {
        if (c == '\'' || c == '"') q = c
        else if (c == '-' && nxt('-')) { lineC = true; i += 1 }
        else if (c == '/' && nxt('*')) { blockC = true; i += 1 }
      }
      i += 1
    }
    q != 0 || lineC || blockC
  }

  /** Epoch millis of a `TIMESTAMP AS OF` operand: bare digits are
    * millis; a quoted string is an ISO instant (`...Z`/offset) or a
    * local `yyyy-MM-dd[ HH:mm:ss]` interpreted as UTC — the commit
    * stamps it compares against are UTC wall-clock millis. */
  private[graft] def asOfMillis(raw: String): Long =
    if (raw.forall(_.isDigit)) raw.toLong
    else {
      val s = raw.stripPrefix("'").stripSuffix("'")
      try java.time.Instant.parse(s).toEpochMilli
      catch {
        case _: java.time.format.DateTimeParseException =>
          val norm = if (s.contains(' ') || s.contains('T'))
            s.replace(' ', 'T')
          else s + "T00:00:00"
          java.time.LocalDateTime.parse(norm)
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      }
    }

  /** Rewrite the time-travel sugar anywhere in the statement — except
    * inside string literals ([[inLiteral]]), which stay verbatim. */
  private[sources] def rewriteTimeTravel(sql: String): String = {
    val v = VersionAsOf.replaceSomeIn(sql, m =>
      if (inLiteral(sql, m.start)) None
      else Some(scala.util.matching.Regex.quoteReplacement(
        s"graft_lake_at('${m.group(1)}', ${m.group(2)})")))
    TimestampAsOf.replaceSomeIn(v, m =>
      if (inLiteral(v, m.start)) None
      else Some(scala.util.matching.Regex.quoteReplacement(
        s"graft_lake_asof('${m.group(1)}', ${asOfMillis(m.group(2))}L)")))
  }

  /** `CALL graft_<verb>(args...)` — the SQL maintenance surface:
    * compact, compact_clustered, compact_zorder, vacuum, restore, tag,
    * publish. Args are literals, parsed by Spark's own expression
    * grammar. */
  private def parseCall(delegate: ParserInterface,
      verb: String, rawArgs: String,
      session: Option[SparkSession]): LogicalPlan = {
    // split on commas OUTSIDE string literals (args are scalar
    // literals — no nesting, but a string arg may contain a comma).
    // BOTH literal forms Spark accepts count ('…' and "…"), tracked as
    // one quote-char state like inLiteral — graft_txn_write specs are
    // often double-quoted so their inner condition can use '…', and a
    // comma inside either form must not split the arg. Backslash
    // escapes skip the next char, so an escaped quote can't toggle.
    def splitArgs(s: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      val cur = new StringBuilder
      var q: Char = 0 // 0 = outside; '\'' or '"' = inside that literal
      var esc = false
      s.foreach { ch =>
        if (esc) { cur += ch; esc = false }
        else if (q != 0 && ch == '\\') { cur += ch; esc = true }
        else if (q != 0) { if (ch == q) q = 0; cur += ch }
        else if (ch == '\'' || ch == '"') { q = ch; cur += ch }
        else if (ch == ',') { out += cur.result(); cur.clear() }
        else cur += ch
      }
      out += cur.result()
      out.toSeq
    }
    val args = if (rawArgs.trim.isEmpty) Nil
      else splitArgs(rawArgs).map(a =>
        delegate.parseExpression(a.trim) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            if (v == null) null
            else v match {
              case u: org.apache.spark.unsafe.types.UTF8String => u.toString
              case other => other
            }
          case other => throw new IllegalArgumentException(
            s"CALL graft_$verb expects literal arguments, got: ${other.sql}")
        })
    def str(i: Int): String = args(i).toString
    // the lake target: a path, or a catalog-qualified cat.db.t name
    def dir0: String = session
      .map(sp => graft.catalog.GraftCatalog.resolveTarget(sp, str(0)))
      .getOrElse(str(0))
    def num(i: Int): Long = args(i) match {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"CALL graft_$verb: argument ${i + 1} must be a number, got $other")
    }
    verb.toLowerCase match {
      case "compact" =>
        require(args.size == 2, "CALL graft_compact(dir, targetPartitions)")
        GraftCallCommand(dir0, s => CommitLog.compact(s, dir0,
          num(1).toInt).version, "compact")
      case "compact_clustered" =>
        require(args.size >= 3,
          "CALL graft_compact_clustered(dir, targetPartitions, col, ...)")
        GraftCallCommand(dir0, s => CommitLog.compactClustered(s, dir0,
          num(1).toInt, args.drop(2).map(_.toString)).version,
          "compact-clustered")
      case "compact_zorder" =>
        require(args.size >= 4,
          "CALL graft_compact_zorder(dir, targetPartitions, col, col, ...)")
        GraftCallCommand(dir0, s => CommitLog.compactZordered(s, dir0,
          num(1).toInt, args.drop(2).map(_.toString)).version,
          "compact-zorder")
      case "compact_where" =>
        require(args.size == 2 || args.size == 3,
          "CALL graft_compact_where(dir, 'partition predicate'" +
            "[, filesPerPartition])")
        GraftCallCommand(dir0, s => CommitLog.compactPartitions(s, dir0,
          org.apache.spark.sql.functions.expr(str(1)),
          if (args.size == 3) num(2).toInt else 1).version,
          "compact-where")
      case "vacuum" | "vacuum_dry_run" =>
        val dry = verb.equalsIgnoreCase("vacuum_dry_run")
        require(args.size == 2 || args.size == 3,
          s"CALL graft_$verb(dir, keepLast[, staleStagingMs])")
        GraftCallCommand(dir0, { s =>
          val dropped = CommitLog.vacuum(s, dir0, num(1).toInt,
            if (args.size == 3) num(2) else 24L * 3600 * 1000,
            dryRun = dry)
          System.err.println(s"[lake-sql] vacuum ${dir0}: " +
            s"${dropped.size} files ${if (dry) "would be " else ""}reclaimed")
          // staleness nudge at the decision point: a branch is usually
          // WHY a vacuum reclaims less than expected, and the operator
          // deciding what to drop should not need to know the
          // graft_lake_branch_report TVF exists — its sole-retained
          // rows print here, per branch, during the dry run
          if (dry) CommitLog.branchRetentionReport(s, dir0).collect()
            .foreach { r =>
              System.err.println(
                s"[lake-sql] vacuum dry-run $dir0: branch " +
                  s"'${r.getString(0)}' (head v${r.getLong(1)}, age " +
                  s"${r.getLong(2) / 1000}s) pins " +
                  s"${r.getLong(3)} data files / ${r.getLong(4)} bytes " +
                  s"+ ${r.getLong(5)} log artifacts / " +
                  s"${r.getLong(6)} bytes only it retains")
            }
          // same staleness nudge for transaction families: their pinned
          // versions survive any keepLast (enforced by vacuum itself),
          // and the operator should see WHO is pinning WHAT before
          // deciding to retire a family
          if (dry) LakeTxn.familyReport(s, dir0).foreach {
            case (fam, vs) => System.err.println(
              s"[lake-sql] vacuum dry-run $dir0: txn family $fam pins " +
                s"version(s) ${vs.mkString(", ")} — kept regardless of " +
                "keepLast")
          }
          if (dry) dropped.size.toLong
          else CommitLog.latest(s, dir0).map(_.version).getOrElse(-1L)
        }, if (dry) "vacuum-dry-run" else "vacuum")
      case "restore" =>
        require(args.size == 2, "CALL graft_restore(dir, version)")
        GraftCallCommand(dir0,
          s => CommitLog.restore(s, dir0, num(1)).version, "restore")
      case "tag" =>
        require(args.size == 3, "CALL graft_tag(dir, name, version)")
        GraftCallCommand(dir0, { s =>
          LakeRefs.tag(s, dir0, str(1), num(2)); num(2)
        }, "tag")
      case "publish" =>
        require(args.size == 2, "CALL graft_publish(dir, version)")
        GraftCallCommand(dir0, { s =>
          LakeRefs.publish(s, dir0, num(1)); num(1)
        }, "publish")
      case "branch" =>
        require(args.size == 2 || args.size == 3,
          "CALL graft_branch(dir, name[, atVersion])")
        GraftCallCommand(dir0, s => CommitLog.createBranch(s, dir0, str(1),
          if (args.size == 3) Some(num(2)) else None).version, "branch")
      case "branch_drop" =>
        require(args.size == 2, "CALL graft_branch_drop(dir, name)")
        GraftCallCommand(dir0, { s =>
          CommitLog.dropBranch(s, dir0, str(1))
          CommitLog.latest(s, dir0).map(_.version).getOrElse(-1L)
        }, "branch-drop")
      case "branch_ff" =>
        require(args.size == 2, "CALL graft_branch_ff(dir, name)")
        GraftCallCommand(dir0,
          s => CommitLog.fastForward(s, dir0, str(1)).version, "branch-ff")
      case "branch_merge" =>
        require(args.size == 2, "CALL graft_branch_merge(dir, name)")
        GraftCallCommand(dir0,
          s => CommitLog.mergeBranch(s, dir0, str(1)).version,
          "branch-merge")
      case "branch_rebase" =>
        require(args.size == 2, "CALL graft_branch_rebase(dir, name)")
        GraftCallCommand(dir0,
          s => CommitLog.rebaseBranch(s, dir0, str(1)).version,
          "branch-rebase")
      case "branch_unfence" =>
        require(args.size == 2, "CALL graft_branch_unfence(dir, name)")
        GraftCallCommand(dir0,
          s => CommitLog.unfenceBranch(s, dir0, str(1)).version,
          "branch-unfence")
      case "clone" =>
        require(args.size == 2 || args.size == 3,
          "CALL graft_clone(srcDir, dstDir[, atVersion])")
        GraftCallCommand(dir0, s => CommitLog.cloneTable(s, dir0,
          graft.catalog.GraftCatalog.resolveTarget(s, str(1)),
          if (args.size == 3) Some(num(2)) else None).version, "clone")
      case "txn_vacuum" =>
        // family retention at the SQL front door — the write twin of
        // graft_txn_read_at's time travel bound: drop all but the
        // newest keepLast manifests (LakeTxn.vacuumManifests). Returns
        // the count of dropped manifests. Participants' own vacuum
        // keeps every RETAINED manifest's pins readable (familyPins),
        // so the two retentions stay aligned through this one dial.
        require(args.size == 2,
          "CALL graft_txn_vacuum(txnDir, keepLast)")
        GraftCallCommand(dir0, s => LakeTxn.vacuumManifests(
          s, dir0, num(1).toInt).size.toLong, "txn-vacuum")
      case "txn_write" =>
        // the MULTI-TABLE ATOMIC WRITE at the SQL front door — the
        // write twin of graft_txn_read/graft_txn_pins: each spec
        // string stages one verb against one participant, the whole
        // set rides LakeTxn.writeAll (per-table family-namespaced
        // ledgers + one manifest CAS), so a SQL-only operator gets the
        // identical crash-window / replay-no-op contract as the Scala
        // API. Returns the committed manifest sequence as `version`.
        require(args.size >= 3,
          "CALL graft_txn_write(txnDir, batchId, 'verb|dir|…', ...)")
        val specs = args.drop(2).map(_.toString)
        GraftCallCommand(dir0, s => LakeTxn.writeAll(s, dir0,
          specs.map(txnWriteSpec(s, _)), num(1)).txn, "txn-write")
      case other => throw new IllegalArgumentException(
        s"unknown lake verb CALL graft_$other — supported: compact, " +
          "compact_clustered, compact_zorder, compact_where, vacuum, " +
          "restore, tag, publish, branch, branch_drop, branch_ff, " +
          "branch_merge, branch_rebase, branch_unfence, " +
          "clone, vacuum_dry_run, txn_write, txn_vacuum")
    }
  }

  /** One staged write of `CALL graft_txn_write` — `'<verb>|<args…>'`
    * with any free-text CONDITION last, so it may itself contain `|`
    * (string concat) without an escape syntax:
    *
    *  - `'append|<dir>|<view>'`
    *  - `'upsert|<dir>|<view>|<k1[,k2…]>|<partitionCol>[|<seqCol>]'`
    *  - `'delete|<dir>|<cond sql>'`
    *  - `'replace_where|<dir>|<view>|<cond sql>'`
    *
    * `<dir>` is a path or a catalog-qualified `cat.db.t`; `<view>` is
    * any table/temp view visible to the session (the staged rows) —
    * resolved at RUN time, so a statement can create the view and
    * CALL in one session flow. */
  private def txnWriteSpec(s: SparkSession,
      spec: String): LakeTxn.TxnWrite = {
    def resolve(d: String): String =
      graft.catalog.GraftCatalog.resolveTarget(s, d.trim)
    def bad(expected: String): Nothing = throw new IllegalArgumentException(
      s"CALL graft_txn_write spec '$spec' — expected $expected")
    spec.split("\\|", 2)(0).trim.toLowerCase match {
      case "append" => spec.split("\\|", -1) match {
        case Array(_, d, v) if v.trim.nonEmpty =>
          LakeTxn.TxnAppend(resolve(d), s.table(v.trim))
        case _ => bad("append|<dir>|<view>")
      }
      case "upsert" => spec.split("\\|", -1) match {
        case a if a.length == 5 || a.length == 6 =>
          // malformed specs must fail HERE, before any verb commits —
          // an empty key list would otherwise surface mid-transaction,
          // after earlier verbs already landed under the family identity
          val keys = a(3).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
          if (keys.isEmpty || a(4).trim.isEmpty)
            bad("upsert|<dir>|<view>|<k1[,k2…]>|<partitionCol>[|<seqCol>] " +
              "with at least one key column")
          LakeTxn.TxnUpsert(resolve(a(1)), s.table(a(2).trim), keys,
            a(4).trim,
            if (a.length == 6) Some(a(5).trim) else None)
        case _ =>
          bad("upsert|<dir>|<view>|<k1[,k2…]>|<partitionCol>[|<seqCol>]")
      }
      case "delete" => spec.split("\\|", 3) match {
        case Array(_, d, c) if c.trim.nonEmpty =>
          LakeTxn.TxnDelete(resolve(d), expr(c))
        case _ => bad("delete|<dir>|<cond sql>")
      }
      case "replace_where" => spec.split("\\|", 4) match {
        case Array(_, d, v, c) if c.trim.nonEmpty =>
          LakeTxn.TxnReplaceWhere(resolve(d), expr(c), s.table(v.trim))
        case _ => bad("replace_where|<dir>|<view>|<cond sql>")
      }
      case other => bad(
        s"a verb in {append, upsert, delete, replace_where}, got '$other'")
    }
  }

  /** `cat.db.t` immediately after a MUTATION verb — recognized as lake
    * DML only when `cat` is a session catalog configured to
    * [[graft.catalog.GraftCatalog]] (INSERT and DDL on catalog names
    * ride Spark's native analyzer route instead —
    * [[graft.catalog.ResolveGraftCatalogOps]]). */
  private val TargetCat =
    """(?is)\b(MERGE\s+INTO|DELETE\s+FROM|UPDATE)\s+([A-Za-z_]\w*)\.([A-Za-z_]\w*)\.([A-Za-z_]\w*)(?![\w.(])""".r

  /** 1- or 2-part mutation target — lake DML only when the session's
    * CURRENT catalog (`USE graft[...]`) is a graft catalog, where every
    * table is a lake by construction (no hijack risk; temp views are
    * not updatable in SQL anyway). */
  private val TargetCur =
    """(?is)\b(MERGE\s+INTO|DELETE\s+FROM|UPDATE)\s+([A-Za-z_]\w*)(\.[A-Za-z_]\w*)?(?![\w.('])""".r

  /** Try to handle `sql` as lake DML; None → not ours, delegate. */
  def parseDml(delegate: ParserInterface, sql: String,
      session: Option[SparkSession] = None): Option[LogicalPlan] =
    Call.findAllMatchIn(sql).find(c => !inLiteral(sql, c.start)).map { c =>
      parseCall(delegate, c.group(1), c.group(2), session): LogicalPlan
    }.orElse(Target.findAllMatchIn(sql).find(m =>
      !inLiteral(sql, m.start)).map(m =>
      translateAt(delegate, sql, m.group(1), m.group(2), m.start, m.end))
    ).orElse(session.flatMap { sp =>
      TargetCat.findAllMatchIn(sql).find(m => !inLiteral(sql, m.start) &&
          graft.catalog.GraftCatalog.catalogNames(sp)
            .exists(_.equalsIgnoreCase(m.group(2))))
        .map { m =>
          val dir = graft.catalog.GraftCatalog.tableDir(sp, m.group(2),
            Seq(m.group(3), m.group(4)))
          translateAt(delegate, sql, m.group(1), dir, m.start, m.end)
        }
    }).orElse(session.flatMap { sp =>
      // 1-/2-part names under `USE <graft-catalog>[.<db>]`
      val graftNames = graft.catalog.GraftCatalog.catalogNames(sp)
      val cur = try org.apache.spark.sql.graftbridge.CatalogBridge
        .currentCatalogName(sp) catch { case _: Throwable => "" }
      if (!graftNames.exists(_.equalsIgnoreCase(cur))) None
      else TargetCur.findAllMatchIn(sql).find(m => !inLiteral(sql, m.start))
        .map { m =>
          val parts = Option(m.group(3)) match {
            case Some(dot) => Seq(m.group(2), dot.stripPrefix("."))
            case None =>
              val ns = org.apache.spark.sql.graftbridge.CatalogBridge
                .currentNamespace(sp)
              require(ns.length == 1,
                s"USE a namespace (USE $cur.<db>) before unqualified " +
                  "lake DML, or qualify the table name")
              Seq(ns.head, m.group(2))
          }
          val dir = graft.catalog.GraftCatalog.tableDir(sp, cur, parts)
          translateAt(delegate, sql, m.group(1), dir, m.start, m.end)
        }
    })

  /** Shared translation: substitute the target at [start, end) with a
    * placeholder identifier, parse with Spark's own grammar, and map
    * the plan onto the [[CommitLog]] verbs. */
  private def translateAt(delegate: ParserInterface, sql: String,
      verb: String, dir: String, start: Int, end: Int): LogicalPlan = {
      val mor = DvSuffix.findFirstMatchIn(sql).exists(d =>
        !inLiteral(sql, d.start))
      val stripped = DvSuffix.replaceSomeIn(sql, d =>
        if (inLiteral(sql, d.start)) None else Some(""))
      // unique placeholder per statement: no temp-view shadowing risk
      val tag = Placeholder + Integer.toHexString(dir.hashCode).takeWhile(_ != '-')
      // replace exactly the matched (non-literal) occurrence: the DV
      // suffix, if stripped, sat after it, so the offsets still hold
      val substituted = stripped.substring(0, start) +
        s"$verb $tag" + stripped.substring(end)
      delegate.parsePlan(substituted) match {
        case DeleteFromTable(tbl, cond) if targets(tbl, tag) =>
          GraftDeleteCommand(dir, stripAlias(cond, aliasOf(tbl)).sql, mor)
        case UpdateTable(tbl, assignments, cond) if targets(tbl, tag) =>
          require(!mor, "USING DELETION VECTORS applies to DELETE only")
          val a = aliasOf(tbl)
          GraftUpdateCommand(dir,
            assignments.map { case Assignment(k, v) =>
              (attrName(k), stripAlias(v, a).sql)
            },
            cond.map(c => stripAlias(c, a).sql))
        case mit: MergeIntoTable if targets(mit.targetTable, tag) =>
          require(!mor, "USING DELETION VECTORS applies to DELETE only")
          translateMerge(dir, mit)
        case AddColumns(tbl, colsToAdd) if targetsTable(tbl, tag) =>
          require(!mor, "USING DELETION VECTORS applies to DELETE only")
          val fields = colsToAdd.map { qc =>
            require(qc.path.isEmpty,
              "ALTER TABLE graft_lake ADD COLUMNS supports top-level " +
                "columns only")
            require(qc.position.isEmpty && qc.default.isEmpty,
              "ALTER TABLE graft_lake ADD COLUMNS supports no FIRST/" +
                "AFTER position and no DEFAULT")
            require(qc.nullable,
              s"ALTER TABLE graft_lake: '${qc.colName}' must be " +
                "nullable — existing rows have no value for it")
            org.apache.spark.sql.types.StructField(qc.colName,
              qc.dataType, nullable = true)
          }
          GraftAddColumnsCommand(dir,
            org.apache.spark.sql.types.StructType(fields))
        case rc: RenameColumn if targetsTable(rc.table, tag) =>
          require(!mor, "USING DELETION VECTORS applies to DELETE only")
          require(rc.column.name.length == 1,
            "ALTER TABLE graft_lake RENAME COLUMN supports top-level " +
              "columns only")
          GraftRenameColumnCommand(dir, rc.column.name.head, rc.newName)
        case ac: AlterColumns if targetsTable(ac.table, tag) =>
          require(!mor, "USING DELETION VECTORS applies to DELETE only")
          val changes = ac.specs.map { sp =>
            require(sp.column.name.length == 1,
              "ALTER TABLE graft_lake ALTER COLUMN supports top-level " +
                "columns only")
            val to = sp.newDataType.getOrElse(
              throw new IllegalArgumentException(
                "ALTER TABLE graft_lake ALTER COLUMN supports TYPE " +
                  "changes only (safe widening)"))
            sp.column.name.head -> to
          }
          GraftAlterColumnTypeCommand(dir, changes)
        case dcols: DropColumns if targetsTable(dcols.table, tag) =>
          require(!mor, "USING DELETION VECTORS applies to DELETE only")
          val names = dcols.columnsToDrop.map { f =>
            require(f.name.length == 1,
              "ALTER TABLE graft_lake DROP COLUMN supports top-level " +
                "columns only")
            f.name.head
          }
          GraftDropColumnsCommand(dir, names, dcols.ifExists)
        case i: InsertIntoStatement if targets(i.table, tag) =>
          require(!mor, "USING DELETION VECTORS applies to DELETE only")
          require(!i.overwrite,
            "INSERT OVERWRITE graft_lake is not supported — OVERWRITE is " +
              "UPDATE/MERGE/replaceWhere territory")
          require(i.partitionSpec.isEmpty,
            "INSERT INTO graft_lake takes no static PARTITION spec — " +
              "carry the partition column in the rows")
          require(i.userSpecifiedCols.isEmpty,
            "INSERT INTO graft_lake inserts whole rows (no column " +
              "list) — project/alias in the SELECT instead")
          GraftInsertCommand(dir, i.query)
        case other => throw new IllegalArgumentException(
          s"graft_lake('$dir') as a DML target supports DELETE/UPDATE/" +
            s"MERGE only; got ${other.getClass.getSimpleName}")
      }
  }

  private def targets(plan: LogicalPlan, tag: String): Boolean = plan match {
    case SubqueryAlias(_, child) => targets(child, tag)
    case r: UnresolvedRelation => r.multipartIdentifier == Seq(tag)
    case _ => false
  }

  /** DDL statements parse their target as an UnresolvedTable. */
  private def targetsTable(plan: LogicalPlan, tag: String): Boolean =
    plan match {
      case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        t.multipartIdentifier == Seq(tag)
      case _ => targets(plan, tag)
    }

  private def aliasOf(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(ident, _) => Some(ident.name)
    case _ => None
  }

  /** Drop a leading target-alias qualifier (`t.col` → `col`) so the
    * condition resolves against the bare snapshot read. */
  private def stripAlias(e: Expression, alias: Option[String]): Expression =
    alias.fold(e) { a =>
      e.transform {
        case u: UnresolvedAttribute
            if u.nameParts.length > 1 && u.nameParts.head.equalsIgnoreCase(a) =>
          UnresolvedAttribute(u.nameParts.tail)
      }
    }

  /** Remap a clause condition's target/source aliases onto the literal
    * `t` / `s` namespaces [[CommitLog.merge]] evaluates its clause SQL
    * in. Unqualified references stay unqualified (they resolve by
    * uniqueness, as in any join). */
  private def remapAliases(e: Expression, tAlias: Option[String],
      sAlias: Option[String]): Expression =
    e.transform {
      case u: UnresolvedAttribute if u.nameParts.length > 1 =>
        val h = u.nameParts.head
        if (tAlias.exists(h.equalsIgnoreCase))
          UnresolvedAttribute("t" +: u.nameParts.tail)
        else if (sAlias.exists(h.equalsIgnoreCase))
          UnresolvedAttribute("s" +: u.nameParts.tail)
        else u
    }

  private def attrName(e: Expression): String = e match {
    case u: UnresolvedAttribute if u.nameParts.length == 1 => u.nameParts.head
    case other => throw new IllegalArgumentException(
      s"UPDATE SET supports plain column names, got: ${other.sql}")
  }

  private def translateMerge(dir: String, m: MergeIntoTable): GraftMergeCommand = {
    val tAlias = aliasOf(m.targetTable)
    val sAlias = aliasOf(m.sourceTable)
    def csql(c: Option[Expression]): String =
      c.map(e => remapAliases(e, tAlias, sAlias).sql).getOrElse("true")

    // ON: conjunction of t.k = s.k equalities → the engine's key columns
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keyCols = conjuncts(m.mergeCondition).map {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          l: UnresolvedAttribute, r: UnresolvedAttribute)
          if l.nameParts.last.equalsIgnoreCase(r.nameParts.last) =>
        l.nameParts.last
      case other => throw new IllegalArgumentException(
        "MERGE INTO graft_lake: the ON clause must be a conjunction of " +
          s"t.key = s.key equalities (the engine merges by key); got: ${other.sql}")
    }

    // column-level assignment list → (target column, value SQL over the
    // t/s namespaces); the target side of each assignment is a plain
    // (possibly target-qualified) column name
    def assigns(as: Seq[Assignment]): Seq[(String, String)] =
      as.map { case Assignment(k, v) =>
        val name = k match {
          case u: UnresolvedAttribute => u.nameParts.last
          case other => throw new IllegalArgumentException(
            s"MERGE assignment target must be a column name, got: ${other.sql}")
        }
        name -> remapAliases(v, tAlias, sAlias).sql
      }

    // the matched/not-matched clause CHAINS, in SOURCE order — the
    // engine applies them first-match-wins natively (CommitLog
    // .mergeClauses), so any number of conditional updates (whole-row
    // or column-level), deletes, and inserts compose as SQL specifies
    def dedupAssigns(kind: String, pairs: Seq[(String, String)])
        : Map[String, String] = {
      val dup = pairs.groupBy(_._1).collect { case (c, p) if p.size > 1 => c }
      require(dup.isEmpty,
        s"MERGE $kind assigns column(s) more than once: ${dup.mkString(", ")}")
      pairs.toMap
    }
    val matchedClauses = m.matchedActions.map {
      case UpdateStarAction(c) => CommitLog.MergeMatched(csql(c))
      case UpdateAction(c, as, _) => CommitLog.MergeMatched(csql(c),
        set = Some(dedupAssigns("UPDATE SET", assigns(as))))
      case DeleteAction(c) => CommitLog.MergeMatched(csql(c), delete = true)
      case other => throw new IllegalArgumentException(
        "MERGE INTO graft_lake WHEN MATCHED supports UPDATE SET */SET " +
          s"col = expr and DELETE; got: ${other.getClass.getSimpleName}")
    }
    val notMatchedClauses = m.notMatchedActions.map {
      case InsertStarAction(c) => CommitLog.MergeNotMatched(csql(c))
      case InsertAction(c, as) => CommitLog.MergeNotMatched(csql(c),
        values = Some(dedupAssigns("INSERT", assigns(as))))
      case other => throw new IllegalArgumentException(
        "MERGE INTO graft_lake WHEN NOT MATCHED supports INSERT * or " +
          s"INSERT (cols) VALUES (exprs); got: ${other.getClass.getSimpleName}")
    }
    val nmbsDelete = m.notMatchedBySourceActions match {
      case Seq() => None
      case Seq(DeleteAction(c)) => Some(csql(c))
      case other => throw new IllegalArgumentException(
        "MERGE INTO graft_lake supports WHEN NOT MATCHED BY SOURCE THEN " +
          "DELETE only; got: " +
          other.map(_.getClass.getSimpleName).mkString(", "))
    }
    GraftMergeCommand(dir, m.sourceTable, keyCols, matchedClauses,
      notMatchedClauses, nmbsDelete)
  }

  def dmlOutput: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("op", StringType, nullable = false)())

  private[sources] def singlePartCol(spark: SparkSession, dir: String): String = {
    val s = CommitLog.latest(spark, dir).getOrElse(throw new IllegalStateException(
      s"$dir has no commit log"))
    CommitLog.partColsOf(s) match {
      case Seq(one) => one
      case other => throw new IllegalArgumentException(
        s"MERGE INTO graft_lake('$dir') needs a single-column hive " +
          s"partitioning (the merge conflict unit); table has: " +
          (if (other.isEmpty) "none" else other.mkString(", ")))
    }
  }
}

/** `CALL graft_<verb>(...)` — one maintenance verb, executed eagerly;
  * returns (version, op) like the DML commands. */
case class GraftCallCommand(dir: String, action: SparkSession => Long,
    op: String) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(action(spark), op))
}

/** `ALTER TABLE graft_lake('dir') ADD COLUMNS (...)` — the schema-only
  * DDL commit [[CommitLog.addColumns]]: zero files touched, existing
  * rows read the new columns as null. */
case class GraftAddColumnsCommand(dir: String,
    newCols: org.apache.spark.sql.types.StructType)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val snap = CommitLog.addColumns(spark, dir, newCols)
    Seq(Row(snap.version, snap.op))
  }
}

/** `ALTER TABLE graft_lake('dir') RENAME COLUMN a TO b` — the
  * metadata-only rename commit [[CommitLog.renameColumn]]: zero files
  * touched, data files keep the physical birth name, reads alias. */
case class GraftRenameColumnCommand(dir: String, from: String, to: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val snap = CommitLog.renameColumn(spark, dir, from, to)
    Seq(Row(snap.version, snap.op))
  }
}

/** `ALTER TABLE graft_lake('dir') ALTER COLUMN c TYPE <wider>` — the
  * zero-file widening commit [[CommitLog.alterColumnType]]: existing
  * files keep the narrow physical type, the scan upcasts. */
case class GraftAlterColumnTypeCommand(dir: String,
    changes: Seq[(String, org.apache.spark.sql.types.DataType)])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val snap = changes.foldLeft(CommitLog.latest(spark, dir).getOrElse(
      throw new IllegalStateException(s"$dir has no commit log"))) {
      case (_, (c, to)) => CommitLog.alterColumnType(spark, dir, c, to)
    }
    Seq(Row(snap.version, snap.op))
  }
}

/** `ALTER TABLE graft_lake('dir') DROP COLUMN [IF EXISTS] c, ...` — the
  * logical-removal commit [[CommitLog.dropColumn]]: bytes stay until
  * the next rewrite, readers prune, the physical name retires. */
case class GraftDropColumnsCommand(dir: String, names: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val have = CommitLog.read(spark, dir).columns.toSet
    val todo = if (ifExists) names.filter(have.contains) else names
    val snap = todo.foldLeft(CommitLog.latest(spark, dir).get) {
      (_, n) => CommitLog.dropColumn(spark, dir, n)
    }
    Seq(Row(snap.version, snap.op))
  }
}

/** `INSERT INTO graft_lake('dir') <query|VALUES ...>` — the pure-append
  * [[CommitLog.append]]: new files only, no partition rewrite, so the
  * commit never clashes with a concurrent writer. The query analyzes at
  * run time against the session catalog (temp views, TVFs — including
  * other graft lakes). */
case class GraftInsertCommand(dir: String, queryPlan: LogicalPlan)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val rows =
      org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark, queryPlan)
    // SQL INSERT binds by POSITION: align the query's columns onto the
    // committed schema (a VALUES source arrives as col1, col2, ...)
    val schema = CommitLog.read(spark, dir).schema
    require(rows.columns.length == schema.length,
      s"INSERT INTO graft_lake('$dir') needs ${schema.length} column(s) " +
        s"(${schema.fieldNames.mkString(", ")}); query has " +
        s"${rows.columns.length}")
    val aligned = rows.toDF(schema.fieldNames.toIndexedSeq: _*)
      .select(schema.fields.toIndexedSeq.map(f =>
        org.apache.spark.sql.functions.col(f.name).cast(f.dataType)): _*)
    val snap = CommitLog.append(spark, aligned, dir)
    Seq(Row(snap.version, snap.op))
  }
}

/** `DELETE FROM graft_lake('dir') WHERE cond [USING DELETION VECTORS]` —
  * copy-on-write [[CommitLog.delete]], or the merge-on-read
  * [[CommitLog.deleteVectors]] with the suffix. */
case class GraftDeleteCommand(dir: String, condSql: String, mor: Boolean)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val snap =
      if (mor) CommitLog.deleteVectors(spark, dir, expr(condSql))
      else CommitLog.delete(spark, dir, expr(condSql))
    Seq(Row(snap.version, snap.op))
  }
}

/** `UPDATE graft_lake('dir') SET c = e, ... [WHERE cond]` — one atomic
  * [[CommitLog.replaceWhere]] commit: the matching rows are deleted and
  * re-inserted with the assignments applied (values cast to the
  * column's committed type, as SQL UPDATE requires). File-granularity
  * copy-on-write with the standard rebase rules.
  *
  * All SET expressions evaluate against the PRE-update row — one select
  * over the base image, never a sequential fold — so
  * `SET a = b, b = a` swaps, exactly as SQL specifies. Assigning the
  * same column twice is ambiguous under that rule and is rejected. */
case class GraftUpdateCommand(dir: String,
    assignments: Seq[(String, String)], condSql: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val base = CommitLog.read(spark, dir)
    val cond = condSql.map(expr).getOrElse(org.apache.spark.sql.functions.lit(true))
    val schema = base.schema
    assignments.foreach { case (c, _) =>
      require(schema.fieldNames.contains(c),
        s"UPDATE graft_lake('$dir'): no column $c in the committed schema")
    }
    val dup = assignments.groupBy(_._1).collect {
      case (c, as) if as.size > 1 => c
    }
    require(dup.isEmpty,
      s"UPDATE graft_lake('$dir'): column(s) assigned more than once: " +
        dup.mkString(", "))
    val assignMap = assignments.toMap
    val updated = base
      .filter(org.apache.spark.sql.functions.coalesce(
        cond, org.apache.spark.sql.functions.lit(false)))
      .select(schema.fields.toIndexedSeq.map { f =>
        assignMap.get(f.name) match {
          case Some(vSql) => expr(vSql).cast(f.dataType).as(f.name)
          case None => org.apache.spark.sql.functions.col(f.name)
        }
      }: _*)
    val snap = CommitLog.replaceWhere(spark, dir, cond, updated)
    Seq(Row(snap.version, snap.op))
  }
}

/** `MERGE INTO graft_lake('dir') … ` — [[CommitLog.merge]] with the
  * parsed clause family. The source query analyzes at run time against
  * the session catalog (temp views, TVFs — including other graft
  * lakes). */
case class GraftMergeCommand(dir: String, sourcePlan: LogicalPlan,
    keyCols: Seq[String],
    matched: Seq[CommitLog.MergeMatched],
    notMatched: Seq[CommitLog.MergeNotMatched],
    notMatchedBySourceDeleteWhen: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val source =
      org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark, sourcePlan)
    val snap = CommitLog.mergeClauses(spark, dir, source, keyCols,
      LakeSqlDml.singlePartCol(spark, dir),
      matched = matched, notMatched = notMatched,
      notMatchedBySourceDeleteWhen = notMatchedBySourceDeleteWhen)
    Seq(Row(snap.version, snap.op))
  }
}

/** The injected [[ParserInterface]]: lake DML and time-travel sugar are
  * peeled off the statement text; everything else — including every
  * non-DML statement and every expression/identifier parse — delegates
  * verbatim to Spark's parser. */
class LakeSqlParser(delegate: ParserInterface,
    session: Option[SparkSession] = None) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan = {
    val sugared = LakeSqlDml.rewriteTimeTravel(sqlText)
    LakeSqlDml.parseDml(delegate, sugared, session)
      .getOrElse(delegate.parsePlan(sugared))
  }
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(LakeSqlDml.rewriteTimeTravel(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)
}

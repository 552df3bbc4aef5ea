package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The SQL DML front door ([[LakeSqlDml]]): DELETE / UPDATE / MERGE
  * issued as pure SQL text must land the same commits as the Scala
  * verbs, the deletion-vector suffix must be merge-on-read, the
  * time-travel sugar must resolve through the read TVFs, and the
  * out-of-surface shapes must be rejected loudly. */
class LakeSqlDmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshLake(): String = {
    val dir = Files.createTempDirectory("graft_dml_").toString + "/lake"
    spark.range(0, 300)
      .select($"id".as("k"), ($"id" % 30).as("v"),
        concat(lit("p"), ($"id" % 3)).as("pd"))
      .write.partitionBy("pd").parquet(dir)
    CommitLog.init(spark, dir)
    dir
  }

  private def rows(dir: String): Set[(Long, Long, String)] =
    CommitLog.read(spark, dir).select($"k", $"v", $"pd")
      .as[(Long, Long, String)].collect().toSet

  test("DELETE FROM graft_lake(...) WHERE — copy-on-write commit") {
    val dir = freshLake()
    val out = spark.sql(
      s"DELETE FROM graft_lake('$dir') WHERE v >= 20").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "delete")))
    assert(rows(dir).forall(_._2 < 20))
    assert(CommitLog.latest(spark, dir).get.dvs.isEmpty)
  }

  test("DELETE ... USING DELETION VECTORS — merge-on-read, zero rewrites") {
    val dir = freshLake()
    val filesBefore = CommitLog.latest(spark, dir).get.files
    val out = spark.sql(
      s"DELETE FROM graft_lake('$dir') WHERE v >= 20 USING DELETION VECTORS")
      .collect()
    assert(out.head.getString(1) == "delete-mor")
    assert(CommitLog.latest(spark, dir).get.files == filesBefore,
      "MoR delete must rewrite no data files")
    assert(CommitLog.latest(spark, dir).get.dvs.size == 1)
    assert(rows(dir).forall(_._2 < 20))
  }

  test("DELETE with a target alias strips the qualifier") {
    val dir = freshLake()
    spark.sql(s"DELETE FROM graft_lake('$dir') AS t WHERE t.k < 10")
    assert(rows(dir).forall(_._1 >= 10))
  }

  test("UPDATE ... SET ... WHERE — atomic replaceWhere, typed assignment") {
    val dir = freshLake()
    val before = rows(dir)
    spark.sql(
      s"UPDATE graft_lake('$dir') SET v = v * 100 + 7 WHERE k < 5")
    val after = rows(dir)
    val expect = before.map { case (k, v, pd) =>
      if (k < 5) (k, v * 100 + 7, pd) else (k, v, pd)
    }
    assert(after == expect)
    // assignment value casts to the committed column type (v is LONG)
    spark.sql(s"UPDATE graft_lake('$dir') SET v = 1.9 WHERE k = 0")
    assert(rows(dir).collect { case (0L, v, _) => v } == Set(1L))
  }

  test("MERGE INTO graft_lake — full clause family in SQL text") {
    val dir = freshLake()
    val before = rows(dir)
    spark.range(0, 310).select($"id".as("k"),
        ($"id" % 30 + 1000).as("v"),
        concat(lit("p"), ($"id" % 3)).as("pd"))
      .createOrReplaceTempView("dml_src")
    spark.sql(
      s"""MERGE INTO graft_lake('$dir') AS t
         |USING (SELECT * FROM dml_src WHERE k < 305) AS s
         |ON t.k = s.k
         |WHEN MATCHED AND t.v >= 25 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED AND s.k % 2 = 0 THEN INSERT *
         |""".stripMargin)
    val after = rows(dir)
    val expect = before.collect {
      case (k, v, pd) if v < 25 => (k, v + 1000, pd)
    } ++ (300L until 305L).collect {
      case k if k % 2 == 0 => (k, k % 30 + 1000, s"p${k % 3}")
    }
    assert(after == expect.toSet)
  }

  test("MERGE clause order: UPDATE before DELETE guards the delete") {
    val dir = freshLake()
    spark.range(0, 10).select($"id".as("k"), lit(9999L).as("v"),
        concat(lit("p"), ($"id" % 3)).as("pd"))
      .createOrReplaceTempView("dml_src2")
    // SQL semantics: first matching clause fires — every matched row
    // satisfies the UPDATE condition, so the DELETE must never fire
    spark.sql(
      s"""MERGE INTO graft_lake('$dir') t
         |USING dml_src2 s
         |ON t.k = s.k
         |WHEN MATCHED AND s.v = 9999 THEN UPDATE SET *
         |WHEN MATCHED THEN DELETE
         |""".stripMargin)
    val got = rows(dir).filter(_._1 < 10)
    assert(got.size == 10 && got.forall(_._2 == 9999L),
      s"first-clause-wins violated: $got")
  }

  test("MERGE ... WHEN NOT MATCHED BY SOURCE THEN DELETE") {
    val dir = freshLake()
    spark.range(0, 100).select($"id".as("k"), ($"id" % 30).as("v"),
        concat(lit("p"), ($"id" % 3)).as("pd"))
      .createOrReplaceTempView("dml_src3")
    spark.sql(
      s"""MERGE INTO graft_lake('$dir') t
         |USING dml_src3 s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED BY SOURCE AND t.k >= 200 THEN DELETE
         |""".stripMargin)
    assert(rows(dir).map(_._1) == (0L until 200L).toSet)
  }

  test("VERSION AS OF / TIMESTAMP AS OF sugar on the read path") {
    val dir = freshLake()
    val t0 = System.currentTimeMillis()
    spark.sql(s"DELETE FROM graft_lake('$dir') WHERE v >= 10")
    val n1 = spark.sql(
      s"SELECT count(*) AS n FROM graft_lake('$dir') VERSION AS OF 1")
      .head().getLong(0)
    assert(n1 == 300L, "VERSION AS OF 1 must see the pre-delete snapshot")
    val nNow = spark.sql(s"SELECT count(*) FROM graft_lake('$dir')")
      .head().getLong(0)
    assert(nNow == 100L)
    val nTs = spark.sql(
      s"SELECT count(*) FROM graft_lake('$dir') TIMESTAMP AS OF $t0")
      .head().getLong(0)
    assert(nTs == 300L, "TIMESTAMP AS OF pre-delete must time-travel")
  }

  test("out-of-surface shapes are rejected loudly") {
    val dir = freshLake()
    // non-equi ON
    val e1 = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO graft_lake('$dir') t USING (SELECT 1 AS k) s
           |ON t.k > s.k WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e1.getMessage.contains("conjunction"))
    // NOT MATCHED BY SOURCE supports DELETE only
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO graft_lake('$dir') t USING (SELECT 1 AS k) s
           |ON t.k = s.k
           |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 1""".stripMargin)
    }
    assert(e2.getMessage.contains("NOT MATCHED BY SOURCE"))
    // MoR suffix on UPDATE
    val e3 = intercept[IllegalArgumentException] {
      spark.sql(
        s"UPDATE graft_lake('$dir') SET v = 1 WHERE k = 0 USING DELETION VECTORS")
    }
    assert(e3.getMessage.contains("DELETE only") ||
      e3.getMessage.toLowerCase.contains("syntax"))
  }

  test("INSERT INTO graft_lake — pure append, SELECT and VALUES forms") {
    val dir = freshLake()
    val filesBefore = CommitLog.latest(spark, dir).get.files.toSet
    val out = spark.sql(
      s"""INSERT INTO graft_lake('$dir')
         |SELECT id AS k, id % 5 AS v, 'p9' AS pd
         |FROM range(1000, 1050)""".stripMargin).collect()
    assert(out.head.getString(1) == "append")
    val snap = CommitLog.latest(spark, dir).get
    assert(filesBefore.subsetOf(snap.files.toSet),
      "INSERT must append files, never rewrite")
    assert(rows(dir).size == 350)
    assert(rows(dir).count(_._3 == "p9") == 50)
    // VALUES form; duplicates land as rows (SQL INSERT semantics)
    spark.sql(s"INSERT INTO graft_lake('$dir') VALUES " +
      "(1000L, 0L, 'p9'), (1000L, 0L, 'p9')")
    assert(CommitLog.read(spark, dir)
      .filter($"k" === 1000L && $"pd" === "p9").count() == 3L)
    // a SELECT reading another graft lake resolves through the TVF
    val dir2 = freshLake()
    spark.sql(s"INSERT INTO graft_lake('$dir') " +
      s"SELECT k + 100000, v, pd FROM graft_lake('$dir2') WHERE k < 10")
    // rows() is a SET: 300 + 50 + 10 distinct (the VALUES pair
    // duplicates an existing tuple — row count already asserted above)
    assert(rows(dir).size == 360)
    assert(CommitLog.read(spark, dir).count() == 362L)
  }

  test("INSERT INTO graft_lake — out-of-surface shapes rejected") {
    val dir = freshLake()
    val e1 = intercept[IllegalArgumentException] {
      spark.sql(s"INSERT OVERWRITE graft_lake('$dir') " +
        "SELECT 1L AS k, 1L AS v, 'p0' AS pd")
    }
    assert(e1.getMessage.contains("OVERWRITE"))
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"INSERT INTO graft_lake('$dir') (k, v, pd) " +
        "VALUES (1L, 1L, 'p0')")
    }
    assert(e2.getMessage.contains("column"))
    // wrong arity → loud positional-binding guard
    val e3 = intercept[IllegalArgumentException] {
      spark.sql(s"INSERT INTO graft_lake('$dir') SELECT 1L AS k, 'p0' AS pd")
    }
    assert(e3.getMessage.contains("needs 3 column"))
  }

  test("ALTER TABLE graft_lake ADD COLUMNS — schema-only DDL commit") {
    val dir = freshLake()
    val filesBefore = CommitLog.latest(spark, dir).get.files
    val out = spark.sql(s"ALTER TABLE graft_lake('$dir') " +
      "ADD COLUMNS (note STRING, score DOUBLE)").collect()
    assert(out.head.getString(1) == "schema")
    assert(CommitLog.latest(spark, dir).get.files == filesBefore,
      "DDL must touch zero data files")
    val r = CommitLog.read(spark, dir)
    assert(r.columns.contains("note") && r.columns.contains("score"))
    assert(r.filter($"note".isNotNull).count() == 0)
    // a positional INSERT can now carry the declared columns (the
    // committed read order: data cols, evolved cols, partition col)
    spark.sql(s"INSERT INTO graft_lake('$dir') VALUES " +
      "(5000, 1, 'x', 2.5, 'p0')")
    assert(CommitLog.read(spark, dir)
      .filter($"note" === "x" && $"score" === 2.5).count() == 1)
    // duplicate and NOT NULL adds refuse loudly
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE graft_lake('$dir') ADD COLUMNS (note STRING)")
    }
    assert(e.getMessage.contains("already exists"))
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(
        s"ALTER TABLE graft_lake('$dir') ADD COLUMNS (z INT NOT NULL)")
    }
    assert(e2.getMessage.contains("nullable"))
    // the DESCRIBE TVF surfaces the evolved schema
    val desc = spark.sql(s"SELECT * FROM graft_lake_describe('$dir')")
      .as[(String, String, Boolean)].collect().toSeq
    assert(desc.map(_._1).containsSlice(Seq("note", "score")))
    assert(desc.contains(("score", "double", true)))
  }

  test("CALL graft_compact / graft_vacuum — SQL maintenance verbs") {
    val dir = freshLake()
    // churn the table so compaction has something to fold
    spark.sql(s"DELETE FROM graft_lake('$dir') WHERE k < 10")
    val out = spark.sql(s"CALL graft_compact('$dir', 2)").collect()
    assert(out.head.getString(1) == "compact")
    val snap = CommitLog.latest(spark, dir).get
    assert(snap.op == "compact" && snap.version == out.head.getLong(0))
    assert(rows(dir).size == 290)
    // vacuum reclaims the pre-compaction files, table still readable
    val v = spark.sql(s"CALL graft_vacuum('$dir', 1)").collect()
    assert(v.head.getString(1) == "vacuum")
    assert(rows(dir).size == 290)
  }

  test("CALL graft_tag / graft_publish / graft_restore — refs in SQL") {
    val dir = freshLake()
    val v1 = CommitLog.latest(spark, dir).get.version
    spark.sql(s"DELETE FROM graft_lake('$dir') WHERE v >= 20")
    spark.sql(s"CALL graft_tag('$dir', 'pre-delete', $v1)")
    assert(LakeRefs.tagVersion(spark, dir, "pre-delete") == v1)
    spark.sql(s"CALL graft_publish('$dir', $v1)")
    assert(LakeRefs.publishedVersion(spark, dir).contains(v1))
    // restore rolls forward to a NEW version whose content is v1's
    val out = spark.sql(s"CALL graft_restore('$dir', $v1)").collect()
    assert(out.head.getString(1) == "restore")
    assert(rows(dir).size == 300)
    assert(CommitLog.latest(spark, dir).get.version > v1)
  }

  test("CALL with a non-literal argument or unknown verb fails loudly") {
    val dir = freshLake()
    val e1 = intercept[IllegalArgumentException] {
      spark.sql(s"CALL graft_compact('$dir', 1 + 1)")
    }
    assert(e1.getMessage.contains("literal"))
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"CALL graft_frobnicate('$dir')")
    }
    assert(e2.getMessage.contains("unknown lake verb"))
  }

  test("MERGE with column-level SET and INSERT (cols) VALUES in SQL text") {
    val dir = freshLake()
    val before = rows(dir)
    spark.sql(
      s"""MERGE INTO graft_lake('$dir') AS t
         |USING (SELECT 1L AS k, 50L AS delta, 'p1' AS pd
         |       UNION ALL SELECT 400L, 9L, 'p1') AS s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = t.v + s.delta
         |WHEN NOT MATCHED THEN INSERT (k, v, pd)
         |  VALUES (s.k, s.delta * 2, s.pd)""".stripMargin)
    val after = rows(dir)
    val expect = before.map {
      case (1L, v, pd) => (1L, v + 50L, pd)
      case other => other
    } + ((400L, 18L, "p1"))
    assert(after == expect)
    // duplicate assignment rejected loudly
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft_lake('$dir') AS t
           |USING (SELECT 1L AS k, 'p1' AS pd) AS s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = 1, v = 2""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.contains("more than once") ||
      e.getMessage.toLowerCase.contains("duplicate"))
  }

  test("UPDATE SET a = b, b = a swaps — all assignments see the pre-image") {
    val dir = Files.createTempDirectory("graft_dml_swap_").toString + "/lake"
    spark.range(0, 10)
      .select($"id".as("k"), ($"id" * 10).as("a"), ($"id" * 100).as("b"))
      .write.parquet(dir)
    CommitLog.init(spark, dir)
    spark.sql(s"UPDATE graft_lake('$dir') SET a = b, b = a WHERE k < 5")
    val got = CommitLog.read(spark, dir).select($"k", $"a", $"b")
      .as[(Long, Long, Long)].collect().toSet
    val expect = (0L until 10L).map(k =>
      if (k < 5) (k, k * 100, k * 10) else (k, k * 10, k * 100)).toSet
    assert(got == expect, "SET must evaluate against the pre-update row")
    // assigning the same column twice is ambiguous → rejected
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"UPDATE graft_lake('$dir') SET a = 1, a = 2")
    }
    assert(e.getMessage.contains("more than once"))
  }

  test("DML-shaped text inside a string literal is NOT lake DML") {
    val dir = freshLake()
    val before = rows(dir)
    // a plain SELECT whose literal mentions the DML grammar must parse
    // as a SELECT — not be misrouted into the translator
    val out = spark.sql(
      "SELECT 'DELETE FROM graft_lake(''/nope'') WHERE 1=1' AS s").collect()
    assert(out.head.getString(0).startsWith("DELETE FROM"))
    val out2 = spark.sql(
      "SELECT \"UPDATE graft_lake('/nope') SET v = 1\" AS s").collect()
    assert(out2.head.getString(0).startsWith("UPDATE"))
    // time-travel sugar inside a literal stays verbatim
    val out3 = spark.sql(
      "SELECT 'graft_lake(''/x'') VERSION AS OF 3' AS s").collect()
    assert(out3.head.getString(0).contains("VERSION AS OF 3"))
    assert(rows(dir) == before)
    // a real DML statement still routes after the guard
    spark.sql(s"INSERT INTO graft_lake('$dir') SELECT 400, 1, 'p1'")
    assert(rows(dir).size == 301)
  }

  test("DML-shaped text inside SQL comments is NOT lake DML") {
    val dir = freshLake()
    val before = rows(dir)
    // line comment: the SELECT must parse as a SELECT, not be hijacked
    // by the translator matching inside the comment
    val out = spark.sql(
      "SELECT 1 AS one -- DELETE FROM graft_lake('/nope') WHERE 1=1\n")
      .collect()
    assert(out.head.getInt(0) == 1)
    // block comment, including one that mentions CALL and time travel
    val out2 = spark.sql(
      "SELECT /* UPDATE graft_lake('/nope') SET v = 1 */ 2 AS two")
      .collect()
    assert(out2.head.getInt(0) == 2)
    val out3 = spark.sql(
      "SELECT /* CALL graft_vacuum('/nope', 0) */ 3 AS three").collect()
    assert(out3.head.getInt(0) == 3)
    // a quote inside a comment opens no literal: DML AFTER the comment
    // still routes
    spark.sql(
      s"/* don't touch 'this */ DELETE FROM graft_lake('$dir') WHERE k = 0")
    assert(rows(dir).size == before.size - 1)
    assert(rows(dir) == before.filterNot(_._1 == 0L))
  }

  test("CALL graft_txn_write: an atomic append+delete lands as ONE " +
    "family cut through pure SQL, the crash window heals by replaying " +
    "the same CALL, and a second replay is a full no-op") {
    val w = Files.createTempDirectory("graft_txnsql_").toString
    val fact = s"$w/fact"; val audit = s"$w/audit"; val txn = s"$w/txn"
    Seq((1L, 10.0), (2L, 20.0), (3L, 5.0)).toDF("k", "amt")
      .write.parquet(fact)
    CommitLog.init(spark, fact)
    Seq((100L, "init")).toDF("k", "note").write.parquet(audit)
    CommitLog.init(spark, audit)
    LakeTxn.commit(spark, txn, Map(fact -> 1L, audit -> 1L))
    // CRASH WINDOW: the retention delete committed under the family
    // identity (the SQL verb's own app id), the audit append and the
    // manifest never happened — family readers still see the old cut
    CommitLog.delete(spark, fact, col("amt") < 15.0,
      txn = Some((LakeTxn.txnAppId(txn), 7L)))
    assert(LakeTxn.read(spark, txn, fact).count() == 3L,
      "manifest reader saw the torn purge")
    Seq((101L, "purged")).toDF("k", "note")
      .createOrReplaceTempView("txnsql_staged_audit")
    def call(): Array[org.apache.spark.sql.Row] = spark.sql(
      s"CALL graft_txn_write('$txn', 7, " +
        s""""delete|$fact|amt < 15.0", """ +
        s"'append|$audit|txnsql_staged_audit')").collect()
    // heal-forward: the delete no-ops via the ledger, the audit append
    // commits, ONE manifest publishes the consistent pair
    val out = call()
    assert(out.map(r => r.getString(1)).toSeq == Seq("txn-write"))
    assert(LakeTxn.read(spark, txn, fact)
      .select($"k").as[Long].collect().toSet == Set(2L))
    assert(LakeTxn.read(spark, txn, audit).count() == 2L)
    // replay of the COMPLETED batch: nothing moves anywhere
    val before = (CommitLog.latest(spark, fact).get.version,
      CommitLog.latest(spark, audit).get.version,
      LakeTxn.latest(spark, txn).get.txn)
    call()
    assert(before == (CommitLog.latest(spark, fact).get.version,
      CommitLog.latest(spark, audit).get.version,
      LakeTxn.latest(spark, txn).get.txn),
      "the replayed SQL transaction must be a full no-op")
  }

  test("CALL graft_txn_write: upsert and replace_where specs compose; " +
    "malformed specs fail loudly before anything commits") {
    val w = Files.createTempDirectory("graft_txnsql2_").toString
    val dim = s"$w/dim"; val sales = s"$w/sales"; val txn = s"$w/txn"
    Seq((1L, "a", "p0"), (2L, "b", "p1")).toDF("k", "name", "pd")
      .write.partitionBy("pd").parquet(dim)
    CommitLog.init(spark, dim)
    Seq((1L, 10.0, "jan"), (2L, 20.0, "jan"), (3L, 30.0, "feb"))
      .toDF("k", "amt", "mon").write.partitionBy("mon").parquet(sales)
    CommitLog.init(spark, sales)
    LakeTxn.commit(spark, txn, Map(dim -> 1L, sales -> 1L))
    Seq((1L, "a2", "p0")).toDF("k", "name", "pd")
      .createOrReplaceTempView("txnsql_dim_up")
    Seq((1L, 11.0, "jan"), (9L, 90.0, "jan")).toDF("k", "amt", "mon")
      .createOrReplaceTempView("txnsql_jan_restated")
    spark.sql(s"CALL graft_txn_write('$txn', 1, " +
      s"'upsert|$dim|txnsql_dim_up|k|pd', " +
      s""""replace_where|$sales|txnsql_jan_restated|mon = 'jan'")""")
    assert(LakeTxn.read(spark, txn, dim)
      .select($"k", $"name").as[(Long, String)].collect().toSet ==
      Set((1L, "a2"), (2L, "b")))
    assert(LakeTxn.read(spark, txn, sales)
      .select($"k", $"amt").as[(Long, Double)].collect().toSet ==
      Set((1L, 11.0), (9L, 90.0), (3L, 30.0)))
    // malformed specs: unknown verb, missing view, bad arity — all
    // loud, nothing committed
    val vBefore = (CommitLog.latest(spark, dim).get.version,
      LakeTxn.latest(spark, txn).get.txn)
    def badCall(spec: String): Throwable = intercept[Exception](spark.sql(
      s"CALL graft_txn_write('$txn', 2, '$spec')").collect())
    assert(badCall("truncate|" + dim)
      .getMessage.contains("append, upsert, delete, replace_where"))
    assert(badCall(s"append|$dim").getMessage.contains("append|<dir>|<view>"))
    assert(badCall(s"upsert|$dim|txnsql_dim_up|k")
      .getMessage.contains("upsert|<dir>"))
    // an EMPTY key list is arity-correct but must still fail at parse —
    // deferring it into writeAll would surface after earlier verbs
    // already committed under the family identity
    assert(badCall(s"upsert|$dim|txnsql_dim_up||pd")
      .getMessage.contains("at least one key column"))
    assert(badCall(s"upsert|$dim|txnsql_dim_up|k|")
      .getMessage.contains("at least one key column"))
    assert(vBefore == (CommitLog.latest(spark, dim).get.version,
      LakeTxn.latest(spark, txn).get.txn),
      "a rejected spec must publish nothing")
    // a comma INSIDE a double-quoted spec must not split the argument
    // (splitArgs tracks both literal forms; the cond here needs its
    // own commas)
    spark.sql(s"""CALL graft_txn_write('$txn', 3, "delete|$sales|k IN (1, 9)")""")
    assert(LakeTxn.read(spark, txn, sales)
      .select($"k").as[Long].collect().toSet == Set(3L),
      "the comma-bearing delete condition must survive arg splitting")
  }

  test("CALL graft_txn_vacuum drops old family manifests; retained " +
    "cuts stay readable, dropped cuts fail loudly") {
    val w = Files.createTempDirectory("graft_txnvac_").toString
    val t = s"$w/tbl"; val txn = s"$w/txn"
    Seq((1L, "a", "p0")).toDF("k", "v", "pd")
      .write.partitionBy("pd").parquet(t)
    CommitLog.init(spark, t)
    LakeTxn.commit(spark, txn, Map(t -> 1L))
    (2 to 4).foreach { i =>
      CommitLog.append(spark,
        Seq((i.toLong, "x", "p0")).toDF("k", "v", "pd"), t)
      LakeTxn.commit(spark, txn,
        Map(t -> CommitLog.latest(spark, t).get.version))
    }
    val out = spark.sql(s"CALL graft_txn_vacuum('$txn', 2)").collect()
    assert(out.head.getLong(0) == 2L, s"expected 2 dropped: ${out.toSeq}")
    // the retained historical cut serves; the dropped one is loud
    assert(LakeTxn.readAt(spark, txn, 3L, t).count() == 3L)
    intercept[IllegalArgumentException] {
      LakeTxn.stateAt(spark, txn, 1L)
    }
  }
}

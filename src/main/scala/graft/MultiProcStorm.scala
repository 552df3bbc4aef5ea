package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.CommitLog

/** MULTI-PROCESS commit-storm ritual — the cross-JVM completion of
  * LogStoreContractSpec's N-writer property (which races writers as
  * THREADS inside one JVM, so it can never catch a CAS primitive that
  * only synchronizes in-process, e.g. anything leaning on JVM locks or
  * a shared client cache). Driven by `tools/multiproc_storm.sh`, which
  * launches each role below as its own `java` process (own
  * SparkSession, own Hadoop FileSystem instance) against ONE table:
  *
  *  - `setup <lake>`: init a partitioned table;
  *  - `writer <lake> <id> <n>`: n appends of one tagged row each —
  *    the conflict-free verb, but every commit still races the CAS;
  *  - `churner <lake> <id> <n>`: n keyed upserts to a writer-private
  *    KEY but a SHARED partition — forces commitRebase's
  *    intervening-commit path (not just version-number races);
  *  - `merger <lake>`: create a branch, append to it, mergeBranch into
  *    the advancing main under the fence — the flagship verb racing
  *    real foreign processes;
  *  - `verify <lake> <writers> <perWriter> <churners> <perChurner>`:
  *    replay the log to the model — contiguous version numbers
  *    (every CAS slot won exactly once), every writer's rows present
  *    exactly once, every churner's key at its LAST value, the merged
  *    branch rows present, zero duplicates.
  *
  * The exit code is the gate: non-zero on any lost write, duplicate,
  * gap, or parse failure. */
object MultiProcStorm {
  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val role = args(0)
    val lake = args(1)
    val spark = session()
    import spark.implicits._
    role match {
      case "setup" =>
        spark.range(0, 10)
          .select($"id".as("k"), lit(0L).as("v"),
            concat(lit("p"), $"id" % 2).as("pd"))
          .write.partitionBy("pd").parquet(lake)
        CommitLog.init(spark, lake)
        println("[storm] setup done")

      case "writer" =>
        val id = args(2).toInt; val n = args(3).toInt
        (0 until n).foreach { i =>
          CommitLog.append(spark,
            Seq((10000L * id + i, id.toLong, s"p${i % 2}"))
              .toDF("k", "v", "pd"), lake)
        }
        println(s"[storm] writer $id committed $n appends")

      case "churner" =>
        val id = args(2).toInt; val n = args(3).toInt
        (1 to n).foreach { i =>
          // two churners share partition p0, so a concurrent rewrite is
          // a TRUE upsert conflict — loud by design (the TYPED
          // CommitLog.WriteConflict), with "re-run against the current
          // snapshot" as the documented recovery. The ritual implements
          // exactly that recovery: the storm's point is that the
          // conflict is DETECTED (never silently merged) and the re-run
          // converges.
          var attempt = 0
          var done = false
          while (!done) {
            try {
              CommitLog.upsert(spark,
                Seq((500L + id, i.toLong, "p0")).toDF("k", "v", "pd"),
                lake, Seq("k"), "pd")
              done = true
            } catch {
              case _: CommitLog.WriteConflict if attempt < 40 =>
                attempt += 1
                Thread.sleep(50L * (1 + attempt % 5))
            }
          }
        }
        println(s"[storm] churner $id committed $n upserts")

      case "merger" =>
        CommitLog.createBranch(spark, lake, "storm")
        val t = CommitLog.branchTarget(lake, "storm")
        (0 until 3).foreach { i =>
          CommitLog.append(spark,
            Seq((90000L + i, 9L, s"p${i % 2}")).toDF("k", "v", "pd"), t)
        }
        // main is advancing under us the whole time: the rebase + adopt
        // pair must converge through the typed-retry loop and the fence
        val adopted = CommitLog.mergeBranch(spark, lake, "storm",
          maxRetries = 30)
        println(s"[storm] merged branch as main v${adopted.version}")

      case "verify" =>
        val writers = args(2).toInt; val perWriter = args(3).toInt
        val churners = args(4).toInt; val perChurner = args(5).toInt
        val f = new org.apache.hadoop.fs.Path(lake)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // 1. every version file parses and the sequence has NO GAPS:
        // each CAS slot was won exactly once, by exactly one process
        val logDir = new org.apache.hadoop.fs.Path(lake, "_graft_log")
        val versions = f.listStatus(logDir).toSeq
          .map(_.getPath.getName)
          .filter(n => n.startsWith("v") && n.endsWith(".json"))
          .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
          .sorted
        require(versions == (1L to versions.size.toLong),
          s"version sequence has gaps/dups: $versions")
        // 2. the final state replays to the model
        val rows = CommitLog.read(spark, lake)
          .select($"k", $"v").as[(Long, Long)].collect()
        require(rows.length == rows.map(_._1).distinct.length,
          "duplicate keys — a lost rebase republished a row")
        val byKey = rows.toMap
        val expectWriters = for {
          id <- 1 to writers; i <- 0 until perWriter
        } yield 10000L * id + i
        expectWriters.foreach(k => require(byKey.contains(k),
          s"writer row $k lost"))
        (1 to churners).foreach { id =>
          require(byKey.get(500L + id).contains(perChurner.toLong),
            s"churner $id final value ${byKey.get(500L + id)} != " +
              s"$perChurner — an upsert was lost or replayed stale")
        }
        (0 until 3).foreach(i => require(byKey.contains(90000L + i),
          s"merged branch row ${90000 + i} lost"))
        val expectTotal = 10 + expectWriters.size + churners + 3
        require(rows.length == expectTotal,
          s"row count ${rows.length} != model $expectTotal")
        // 3. the branch survived its merge usable: fence cleared, fork
        // re-pointed at the adoption
        val head = CommitLog.latest(spark,
          CommitLog.branchTarget(lake, "storm")).get
        require(!head.props.contains(CommitLog.FenceProp),
          "merge left the branch fenced")
        println(s"[storm] VERIFIED: ${versions.size} contiguous " +
          s"versions, $expectTotal rows exact, merge clean")
    }
    spark.stop()
  }
}

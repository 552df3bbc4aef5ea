package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.runtime.Lifetime

/** Stage-level profiling main (optimization-guide §1: measure first).
  *
  * Runs each named registered query under the SAME session shape as
  * [[Bench]] (master local[$SPARK_GRAFT_CPUS], shuffle partitions =
  * cpus) with a listener that records, per stage: wall time, task
  * count, input bytes/rows, shuffle read/write bytes, and the max/med
  * task-time ratio (the skew telltale). Two passes per query; the
  * second (warm) pass's stages are printed so parquet-footer/JIT
  * warmup doesn't pollute the shape. Output is one table per query on
  * stdout — this main is tooling, never part of the driver contract.
  */
object ProfileStages {
  private case class StageRow(id: Int, name: String, ms: Long, tasks: Int,
    inputMb: Double, shReadMb: Double, shWriteMb: Double,
    maxTaskMs: Long, medTaskMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    sys.env.get("SPARK_GRAFT_EXCLUDE_RULES")
      .foreach(spark.conf.set("spark.sql.optimizer.excludedRules", _))
    // A/B harness for session-level conf: SPARK_GRAFT_EXTRA_CONF=k=v;k=v
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })

    val stages = mutable.ArrayBuffer[StageRow]()
    val taskDurs = mutable.Map[Int, mutable.ArrayBuffer[Long]]()
    var jobs = 0
    // ONE lock shared by both listeners AND the main thread's
    // clear/snapshot sections: each anonymous listener's bare
    // `synchronized` used to lock ITSELF, so a late listener-bus event
    // could race the between-pass clear and pollute the warm table
    val lock = new Object
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        lock.synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          val i = sc.stageInfo
          val m = i.taskMetrics
          val durs = taskDurs.getOrElse(i.stageId, mutable.ArrayBuffer.empty)
          val sorted = durs.sorted
          val med = if (sorted.isEmpty) 0L else sorted(sorted.size / 2)
          val mx = if (sorted.isEmpty) 0L else sorted.last
          stages += StageRow(i.stageId, i.name.takeWhile(_ != '\n').take(60),
            i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
            i.numTasks,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            mx, med)
        }
    }
    // task durations arrive on task end; cheapest is the stage-level
    // executorRunTime split — use a task-end hook instead
    val taskListener = new SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        lock.synchronized {
          taskDurs.getOrElseUpdate(te.stageId, mutable.ArrayBuffer.empty) +=
            te.taskInfo.duration
        }
    }
    spark.sparkContext.addSparkListener(taskListener)
    spark.sparkContext.addSparkListener(listener)

    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // cold pass (not reported)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val cold = (System.nanoTime() - t0) / 1e9
      Lifetime.releaseAll(spark, blocking = true)
      lock.synchronized { stages.clear(); taskDurs.clear(); jobs = 0 }
      // warm pass (reported)
      val t1 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val warm = (System.nanoTime() - t1) / 1e9
      Lifetime.releaseAll(spark, blocking = true)
      println(f"\n===== $name cold=$cold%.2fs warm=$warm%.2fs jobs=$jobs =====")
      println(f"${"stage"}%6s ${"ms"}%7s ${"tasks"}%5s ${"inMB"}%8s ${"shRdMB"}%8s ${"shWrMB"}%8s ${"maxT"}%6s ${"medT"}%6s  name")
      val snap = lock.synchronized { stages.toVector }
      snap.sortBy(-_.ms).take(30).foreach { s =>
        println(f"${s.id}%6d ${s.ms}%7d ${s.tasks}%5d ${s.inputMb}%8.1f ${s.shReadMb}%8.2f ${s.shWriteMb}%8.2f ${s.maxTaskMs}%6d ${s.medTaskMs}%6d  ${s.name}")
      }
      val totalStageMs = snap.map(_.ms).sum
      println(f"stage-ms total: $totalStageMs (wall ${warm * 1000}%.0f ms — gap = driver/plan/schedule)")
    }
    spark.stop()
  }
}

package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-stage profile of one SparkEntry query (diagnostic only): runs the
  * query `reps` times (first untimed warm-up), then prints every stage of
  * the last run with wall ms, task count, total task time, and shuffle
  * bytes — the empirical loop of guide §1.1 without the (disabled) UI.
  * Usage: runMain graft.QProf q19_minhash_dedup [reps]
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-qprof")
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)

    final case class StageRow(id: Int, name: String, wallMs: Long, tasks: Int,
        taskMs: Long, shRead: Long, shWrite: Long, submitted: Long)
    val stages = mutable.ArrayBuffer.empty[StageRow]
    var nJobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized { nJobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n'),
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks, m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          si.submissionTime.getOrElse(0L))
      }
    }

    (1 to reps).foreach { i =>
      SparkEntry.clearEntryCache()
      if (i == reps) {
        Thread.sleep(500) // let queued listener events drain (bus is async)
        spark.sparkContext.addSparkListener(listener)
      }
      val (n, sec) = Bench.time(fn(spark, sfDir).count())
      println(f"[qprof] $name run $i rows=$n wall=$sec%.3f s")
    }
    Thread.sleep(500)
    println(f"[qprof] jobs=$nJobs stages=${stages.length}")
    stages.sortBy(_.submitted).foreach { r =>
      println(f"[qprof] stage ${r.id}%4d wall=${r.wallMs}%5d ms tasks=${r.tasks}%3d " +
        f"taskTime=${r.taskMs}%6d ms shR=${r.shRead}%9d shW=${r.shWrite}%9d  ${r.name}")
    }
    spark.stop()
  }
}

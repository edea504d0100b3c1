package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.ml.SectionTagger
import graft.sources.TranscriptGen

/** Stage-level profile of the FUSED kg pipeline run (the un-instrumented
  * shape graft.Bench times): per-stage wall/task-time/shuffle bytes of the
  * last of `reps` computeTriples().count() runs. Diagnostic only.
  * Usage: runMain graft.KgProf [reps]
  */
object KgProf {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_CONVS", "40000").toLong
    implicit val spark: org.apache.spark.sql.SparkSession =
      Sessions.local(cpus, appName = "graft-kgprof")
    spark.sparkContext.setLogLevel("WARN")

    val tagger = SectionTagger.train(KgPipeline.taggerTrainingFrame(spark, nConvs = 200))
    val turns = TranscriptGen.dataset(spark, nConvs, seed = 42L, skewConvs = 4, skewTurns = 800).cache()
    println(s"[kgprof] turns=${turns.count()}")

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

    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
      val df = KgPipeline.computeTriples(turns, tagger).toDF()
      java.nio.file.Files.write(java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_PLANS", "plans/r06") + "/kg_pipeline_" +
          sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before") + ".txt"),
        df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
          .getBytes("UTF-8"))
    }

    (1 to reps).foreach { i =>
      if (i == reps) {
        Thread.sleep(500)
        spark.sparkContext.addSparkListener(listener)
      }
      val (m, sec) = Bench.time(KgPipeline.computeTriples(turns, tagger).count())
      val cpu = Bench.processCpuSec()
      println(f"[kgprof] run $i triples=$m wall=$sec%.3f s (cum cpu=$cpu%.1f)")
    }
    Thread.sleep(500)
    println(f"[kgprof] jobs=$nJobs stages=${stages.length}")
    stages.sortBy(_.submitted).foreach { r =>
      println(f"[kgprof] stage ${r.id}%4d wall=${r.wallMs}%5d ms tasks=${r.tasks}%3d " +
        f"taskTime=${r.taskMs}%6d ms shR=${r.shRead}%9d shW=${r.shWrite}%9d  ${r.name}")
    }
    spark.stop()
  }
}

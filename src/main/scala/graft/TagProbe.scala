package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.SectionTagger
import graft.sources.TranscriptGen

/** Diagnostic: isolates the compiled-tagger serve cost (s2_tag) at a given
  * master, repeated so JIT warm-up and steady state separate. Used to
  * root-cause the local-cluster s2 anomaly (see BENCH_SCALING.md round 3).
  */
object TagProbe {
  def main(args: Array[String]): Unit = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_CONVS", "100000").toLong
    implicit val spark: SparkSession =
      if (master.startsWith("cluster:"))
        Sessions.localCluster(master.stripPrefix("cluster:").toInt, appName = "graft-tagprobe")
      else Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
        appName = "graft-tagprobe")
    spark.sparkContext.setLogLevel("WARN")
    val tagger = SectionTagger.train(KgPipeline.taggerTrainingFrame(spark, nConvs = 200))
    val turns = TranscriptGen.dataset(spark, nConvs, 42L, 4, 800).cache()
    println(s"[probe] turns=${turns.count()}")
    val cleaned = KgPipeline.cleanTurns(turns).cache()
    cleaned.count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SectionTagger.predict(tagger, cleaned).agg(count(col("category"))).head()
      println(f"[probe] predict pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

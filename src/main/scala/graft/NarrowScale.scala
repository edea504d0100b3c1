package graft

import org.apache.spark.sql.functions._

import graft.sources.TranscriptGen

/** Diagnostic: does a pure narrow (no-shuffle) codegen stage scale with
  * cores on this box? Isolates JVM/environment effects from shuffle
  * behavior.
  */
object NarrowScale {
  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_CONVS", "100000").toLong
    Seq(8, 32).foreach { cores =>
      val spark = Sessions.local(cores, appName = s"narrow-$cores")
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val turns = TranscriptGen.dataset(spark, nConvs, 42L, 0, 0).cache()
      val n = turns.count()
      // warm codegen
      KgPipeline.cleanTurns(turns.limit(1000)).agg(sum(length(col("text_clean")))).head()
      val t0 = System.nanoTime()
      KgPipeline.cleanTurns(turns).agg(sum(length(col("text_clean")))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[narrow] cores=$cores turns=$n clean_sec=$sec%.2f rate=${n / sec}%.0f turns/s")
      spark.stop()
    }
  }
}

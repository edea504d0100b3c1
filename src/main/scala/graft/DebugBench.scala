package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.SectionTagger
import graft.operators._
import graft.sources.TranscriptGen

/** Phase-level wall-time breakdown of the pipeline (each phase cached and
  * counted so deltas isolate one operator). Diagnostic only.
  */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_CONVS", "40000").toLong
    // SPARK_GRAFT_MASTER=cluster:<execs> runs the same breakdown on a
    // local-cluster of separate executor JVMs (8 cores each)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "")
    implicit val spark: SparkSession =
      if (master.startsWith("cluster:"))
        Sessions.localCluster(master.stripPrefix("cluster:").toInt, appName = "graft-debug")
      else Sessions.local(cpus, appName = "graft-debug")
    spark.sparkContext.setLogLevel("WARN")

    val tagger = SectionTagger.train(KgPipeline.taggerTrainingFrame(spark, nConvs = 200))
    val turns = TranscriptGen.dataset(spark, nConvs, 42L, 4, 800).cache()
    val n = turns.count()
    println(s"[debug] turns=$n cores=$cpus")

    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[debug] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val cleaned = KgPipeline.cleanTurns(turns).cache()
    phase("s1_clean")(cleaned.count())
    val tagged = SectionTagger.predict(tagger, cleaned).cache()
    phase("s2_tag")(tagged.count())
    val extracted = TurnExtract.extract(tagged).cache()
    phase("s3_extract")(extracted.count())
    val convs = ConvFinalize.run(extracted).cache()
    phase("s4_conv")(convs.count())
    val convSkills = convs.select(col("conv_id"), explode(col("skills")).as("skill"))
    val si = Scoring.sectorAndIsco(convSkills).cache()
    phase("s5_scoring")(si.count())
    val canon = phase("s5_linking") {
      val c = Linking.canonicalize(convs.toDF().select(explode(col("orgs")).as("surface"))).cache()
      c.count(); c
    }
    val estimates = Scoring.estimates(si.select("conv_id", "isco3"),
      convs.toDF().select(col("conv_id"), col("location")).filter(col("location").isNotNull))
    phase("s6_emit")(TripleEmit.run(convs, si.select("conv_id", "sector"), estimates, canon).count())
    spark.stop()
  }
}

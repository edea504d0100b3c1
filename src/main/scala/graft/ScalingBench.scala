package graft

/** Two-parallelism scaling evidence (BASELINE.json: ≥ 0.8 efficiency from
  * N to 4N executors; sandbox proxy = local[8] vs local[32] on identical
  * input with shuffle partitions scaled accordingly — see BASELINE.md).
  * Runs the same KG-pipeline job at both levels in one JVM (sequential
  * SparkContexts) and prints one JSON line.
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_CONVS", "40000").toLong
    val levels = Seq(8, 32)

    val results = levels.map { cores =>
      val spark = Sessions.local(cores, appName = s"graft-scaling-$cores")
      spark.sparkContext.setLogLevel("WARN")
      // warm-up: small run to JIT/codegen before the measured run
      Bench.kgPipeline(spark, 200)
      val (nTurns, nTriples, sec) = Bench.kgPipeline(spark, nConvs)
      spark.stop()
      (cores, nTurns, nTriples, sec, nTurns / sec)
    }

    val (c1, n1, _, s1, tput1) = results.head
    val (c2, _, _, s2, tput2) = results.last
    val speedup = tput2 / tput1
    val efficiency = speedup / (c2.toDouble / c1)
    val qs = results.map { case (c, _, _, sec, tput) =>
      f""""local[$c]":{"sec":$sec%.2f,"turns_per_sec":$tput%.1f}"""
    }.mkString("{", ",", "}")
    println(
      f"""{"metric":"scaling_efficiency","value":$efficiency%.3f,"unit":"ratio","levels":$qs,"turns":$n1,"speedup":$speedup%.3f}""")
  }
}

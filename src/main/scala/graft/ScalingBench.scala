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

    // Repetitions INTERLEAVE the two levels (8,32,8,32,…) and keep the
    // per-level minimum: the sandbox host injects large random interference
    // on a timescale of minutes (see BENCH_SCALING.md), so running one
    // level's reps back-to-back lets a slow phase masquerade as a scaling
    // effect. Min-of-N over interleaved runs isolates the code's behavior.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val runsByLevel = collection.mutable.Map(levels.map(_ -> List.empty[(Long, Long, Double)]): _*)
    // hypervisor steal over any measured run (host evidence); stays -1.0 =
    // "not measurable" if /proc/stat was unreadable — never report an
    // affirmative quiet-host 0.0 when the evidence is absent
    var maxSteal = -1.0
    (1 to reps).foreach { rep =>
      levels.foreach { cores =>
        val spark = Sessions.local(cores, appName = s"graft-scaling-$cores-r$rep")
        spark.sparkContext.setLogLevel("WARN")
        // warm-up: small run to JIT/codegen before the measured run
        Bench.kgOnce(spark, 200)
        val (run, m) = Bench.measure(Bench.kgOnce(spark, nConvs))
        maxSteal = math.max(maxSteal, m.stealPct)
        runsByLevel(cores) ::= run
        spark.stop()
      }
    }
    val results = levels.map { cores =>
      val (nTurns, nTriples, sec) = runsByLevel(cores).minBy(_._3)
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
      f"""{"metric":"scaling_efficiency","value":$efficiency%.3f,"unit":"ratio","levels":$qs,"turns":$n1,"speedup":$speedup%.3f,"max_steal_pct":$maxSteal%.1f}""")
  }
}

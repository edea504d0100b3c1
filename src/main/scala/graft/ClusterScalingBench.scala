package graft

/** Scaling evidence with REAL separate executor processes: the same KG job
  * on `local-cluster` masters at N=1 and 4N=4 executors (8 cores each) —
  * the north rule's "N and 4N executors" criterion run literally, to the
  * extent one host allows. Unlike the `local[8]`/`local[32]` proxy
  * (ScalingBench), every executor here is its own JVM: own heap, own GC,
  * own JIT code cache, shuffle over the block-transfer service — the
  * intra-JVM thread pathologies BENCH_SCALING.md documents cannot occur.
  * What stays shared is the host's single memory bus (its measured 8→32
  * thread copy-bandwidth scaling is 0.55), so this is a lower bound on
  * real N→4N node scale-out, where each node brings its own bus.
  *
  * Levels INTERLEAVE with min-of-N per level, as in ScalingBench.
  * Run via direct java with SPARK_HOME=/opt/spark (the in-process workers
  * build executor commands from it).
  */
object ClusterScalingBench {

  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_CONVS", "40000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val coresPerExec = sys.env.getOrElse("SPARK_GRAFT_EXEC_CORES", "8").toInt
    // measured passes per session (after the warm-up pass). At small
    // cores-per-executor the fresh JVMs' C2 tier-up stretches over several
    // passes (each executor gets 1/execs of the warm-up rows AND has fewer
    // compiler threads), so steady state needs more than 2 passes — the
    // per-pass `runs` arrays in the JSON make the cold->warm trajectory
    // visible instead of burying it in a min.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val levels = Seq(1, 4) // executor counts: N and 4N

    val runsByLevel = collection.mutable.Map(levels.map(_ -> List.empty[(Long, Long, Double)]): _*)
    var maxSteal = -1.0
    (1 to reps).foreach { rep =>
      levels.foreach { execs =>
        val spark = Sessions.localCluster(execs, coresPerExec,
          appName = s"graft-cluster-$execs-r$rep")
        spark.sparkContext.setLogLevel("WARN")
        // wait until every executor registered — measuring before that
        // would charge executor startup to the small level only
        val want = execs
        val deadline = System.nanoTime() + 120L * 1000000000L
        while (spark.sparkContext.getExecutorMemoryStatus.size < want + 1 &&
            System.nanoTime() < deadline) Thread.sleep(200)
        // warm-up outside the window, sized to drain the fresh executor
        // JVMs' JIT tier-up backlog — a 200-conv touch leaves the first
        // measured pass inside the C2 warm-up window (measured: the same
        // serve stage reads 19.6 s cold, 2.6 s on the next identical pass;
        // warm cluster stages match or beat local[32] stage-for-stage)
        Bench.kgOnce(spark, math.max(nConvs / 10, 2000))
        // steady-state protocol, as Bench.kgPipeline: `passes` measured
        // passes per session, keep the best (fresh-executor residue only
        // decays); every pass stays visible in the JSON `runs` arrays
        (1 to passes).foreach { _ =>
          val (run, m) = Bench.measure(Bench.kgOnce(spark, nConvs))
          maxSteal = math.max(maxSteal, m.stealPct)
          runsByLevel(execs) ::= run
        }
        spark.stop()
      }
    }
    val results = levels.map { execs =>
      val (nTurns, nTriples, sec) = runsByLevel(execs).minBy(_._3)
      (execs, nTurns, nTriples, sec, nTurns / sec)
    }
    val (e1, n1, _, _, tput1) = results.head
    val (e2, _, _, _, tput2) = results.last
    val speedup = tput2 / tput1
    val efficiency = speedup / (e2.toDouble / e1)
    val qs = results.map { case (e, _, _, sec, tput) =>
      // `runs` lists every measured pass in execution order (oldest first):
      // a decaying sequence is JIT residue, a flat one is steady state
      val runs = runsByLevel(e).reverse.map(r => f"${r._3}%.2f").mkString("[", ",", "]")
      f""""executors=$e%d x $coresPerExec%d":{"sec":$sec%.2f,"turns_per_sec":$tput%.1f,"runs":$runs}"""
    }.mkString("{", ",", "}")
    println(
      f"""{"metric":"cluster_scaling_efficiency","value":$efficiency%.3f,"unit":"ratio","levels":$qs,"turns":$n1,"speedup":$speedup%.3f,"max_steal_pct":$maxSteal%.1f}""")
  }
}

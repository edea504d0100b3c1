package graft

import java.nio.file.{Files, Paths}

/** Round-6 optimization harness (guide §1.4): per-query noop-sink timing —
  * the noop write computes every column of every row, so it times the
  * computation without the sink — plus `.explain("formatted")` capture to
  * `plans/<round>/<query>_<suffix>.txt` for the plan-diff evidence trail.
  *
  * Diagnostic only: the driver's frozen contract stays in graft.Bench
  * (count-action, min-of-QREPS); this main exists so before/after numbers
  * and plan shapes can be recorded per guide §1 without touching it.
  *
  * Usage: runMain graft.BenchExtra [queryName ...]   (default: the headline set)
  *   SPARK_GRAFT_PLANS=plans/r06  SPARK_GRAFT_PLAN_SUFFIX=before|after
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS", "plans/r06")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val reps = sys.env.getOrElse("SPARK_GRAFT_QREPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    val spark = Sessions.local(cpus, appName = "graft-bench-extra")
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // untimed warm-up pass (same rationale as Bench: C2 tier-up)
    names.foreach { n =>
      noop(SparkEntry.queries(n)(spark, sfDir)); SparkEntry.clearEntryCache()
    }

    val times = names.map { n =>
      val fn = SparkEntry.queries(n)
      val df = fn(spark, sfDir)
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
        df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
          .getBytes("UTF-8"))
      val runs = (1 to reps).map { _ =>
        SparkEntry.clearEntryCache()
        spark.sparkContext.setJobDescription(s"noop:$n")
        val (_, m) = Bench.measure(noop(fn(spark, sfDir)))
        m.sec
      }
      spark.sparkContext.setJobDescription(null)
      n -> runs.min
    }
    val total = times.map(_._2).sum
    val js = times.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    println(f"""{"metric":"noop_total","value":$total%.3f,"unit":"sec","queries":$js,"sf":"$sfDir","suffix":"$suffix","cores":$cpus}""")
    spark.stop()
  }
}

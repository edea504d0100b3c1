package graft

/** Single-query timing harness for iterating on one SparkEntry query at a
  * time (Bench runs the whole headline set). Diagnostic only.
  * Usage: runMain graft.QBench q19_minhash_dedup [more names...]
  * SPARK_GRAFT_SHOW=1 additionally prints the query result.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-qbench")
    spark.sparkContext.setLogLevel("WARN")
    val show = sys.env.get("SPARK_GRAFT_SHOW").contains("1")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (show) {
        fn(spark, sfDir).show(60, false)
        // show() ran the query and populated the entry() memo — drop it so
        // the first timing below measures the pipeline, not a checkpoint scan
        SparkEntry.clearEntryCache()
      }
      val (n1, t1) = Bench.time(fn(spark, sfDir).count())
      // entry() memoizes per session for Verify economy — drop it so the
      // second timing re-runs the pipeline, not a checkpoint-block scan
      SparkEntry.clearEntryCache()
      val (_, t2) = Bench.time(fn(spark, sfDir).count())
      println(f"[qbench] $name rows=$n1 warm=$t1%.2f s second=$t2%.2f s")
    }
    spark.stop()
  }
}

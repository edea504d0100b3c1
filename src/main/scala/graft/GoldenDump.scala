package graft

/** Regenerates the committed golden parquet files that back the q23/q31
  * DuckDB oracles (the files under golden/). The flagship KG output is a pure
  * function of (seed, code): training partitioning is pinned in
  * KgPipeline.taggerTrainingFrame, so the same triples reproduce at any
  * parallelism. Run after ANY change that affects the pipeline output,
  * then commit the refreshed files:
  *
  *   sbt "runMain graft.GoldenDump /tmp/golden_dump"
  *   cp /tmp/golden_dump/q23/part-*.parquet golden/q23_triples.parquet
  *   cp /tmp/golden_dump/q31/part-*.parquet golden/q31_wide.parquet
  */
object GoldenDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/golden_dump")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt,
      appName = "graft-golden-dump")
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q23_kg_triples")(spark, "")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q23")
    SparkEntry.queries("q31_wide_export")(spark, "")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q31")
    println(s"[golden] dumped to $out")
    spark.stop()
  }
}

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

  /** queries pinned by a committed golden parquet: the seed-deterministic
    * KG flagship pair (input-independent) plus every rows-only query over
    * the driver's DETERMINISTIC sf0.01 tables (TESTDATA.md: fixed, never
    * regenerated) — ML/LSH/chunker ops whose semantics live in ScalaTest
    * differentials; the golden gives each a driver-visible value-exact
    * regression pin too.
    */
  val goldenQueries: Seq[(String, String)] = Seq(
    "q23_kg_triples" -> "q23_triples",
    "q31_wide_export" -> "q31_wide",
    "q19_minhash_dedup" -> "q19_minhash",
    "q20_simhash_candidates" -> "q20_simhash",
    "q21_ann_lsh" -> "q21_ann_lsh",
    "q24_entity_linking" -> "q24_linking",
    "q25_clean_chain" -> "q25_clean",
    "q32_html_chunks" -> "q32_chunks")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/golden_dump")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt,
      appName = "graft-golden-dump")
    spark.sparkContext.setLogLevel("WARN")
    goldenQueries.foreach { case (q, name) =>
      SparkEntry.queries(q)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
      println(s"[golden] $q -> $out/$name")
    }
    println(s"[golden] dumped to $out — copy each part file to golden/<name>.parquet")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-aware defaults this engine assumes.
  *
  * Local mode is a stand-in for a multi-executor cluster: `cores` models the
  * executor count, `shufflePartitions` is tuned to it (never the 200
  * default). AQE is on so skew joins / partition coalescing re-plan at
  * runtime the same way they would on a 1000-executor cluster.
  */
object Sessions {
  def local(cores: Int = 32, shufflePartitions: Int = -1, appName: String = "graft"): SparkSession = {
    val sp = if (shufflePartitions > 0) shufflePartitions else cores
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // keep AQE from coalescing mid-size shuffles below the core count —
      // the conv-level mapGroups stage must fan out to every executor
      // (advisory default 64 MB serializes it at bench scale; on a real
      // cluster inputs dwarf this and the knob is moot)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      // broadcast threshold tuned explicitly (north_rule): every dim table
      // in this engine is < 8 MB by construction; fact-fact joins must
      // never be broadcast accidentally.
      .config("spark.sql.autoBroadcastJoinThreshold", (8L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}

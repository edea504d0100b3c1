package graft

import org.apache.spark.sql.functions._

/** Input-scaling evidence for the banded minhash dedup (diagnostic): the
  * candidate generation must grow ~linearly with corpus size (banding,
  * never O(n²)). Times minHashDedup on the sf0.1 documents replicated
  * 2×/8×/32× with id offsets (each replica is an exact-dup family, the
  * worst case for a dedup operator's candidate volume).
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    implicit val spark: org.apache.spark.sql.SparkSession =
      Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
        appName = "graft-dedup-scale")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    Seq(2, 8, 32).foreach { reps =>
      val u = (0 until reps).map(k =>
          docs.select((col("doc_id") + k.toLong * 1000000L).as("doc_id"), col("text")))
        .reduce(_ union _).cache()
      val n = u.count()
      val (rows, sec) = Bench.time(
        operators.Dedup.minHashDedup(u, "doc_id", "text", maxDistance = 0.3).count())
      u.unpersist()
      println(f"[dedup-scale] docs=$n rows_out=$rows sec=$sec%.2f docs_per_sec=${n / sec}%.0f")
    }
    spark.stop()
  }
}

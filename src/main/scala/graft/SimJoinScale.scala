package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TokenJaccardFunctions.token_jaccard
import graft.operators.Dedup

/** Scale evidence for plans.SimilarityJoinRule: the SAME declarative
  * cross-join + token_jaccard threshold, timed with the rewrite firing
  * (TokenJaccardExpr form) vs the quadratic plan (composed-Column form,
  * which the rule deliberately does not match). Counts are asserted equal
  * — the rewrite is exact, so this is also a live differential.
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.SimJoinScale
  */
object SimJoinScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-simjoin-scale")
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Int): DataFrame =
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") < n)
        .select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("sh"))
        .localCheckpoint() // shingle once; time only the join

    def declarative(d: DataFrame): DataFrame =
      d.as("a").crossJoin(d.as("b"))
        .filter(token_jaccard(col("a.sh"), col("b.sh")) > 0.05 &&
          col("a.id") < col("b.id"))
    def naive(d: DataFrame): DataFrame =
      d.as("a").crossJoin(d.as("b"))
        .filter(Dedup.jaccard(col("a.sh"), col("b.sh")) > 0.05 &&
          col("a.id") < col("b.id"))

    def run(q: DataFrame => DataFrame, d: DataFrame): (Long, Double) =
      Bench.time(q(d).count())

    // SPARK_GRAFT_SKIP_QUAD=1 re-measures only the rewritten side (the
    // quadratic baseline dominates wall time and is plan-stable)
    val skipQuad = sys.env.get("SPARK_GRAFT_SKIP_QUAD").contains("1")
    for (n <- Seq(500, 1000, 2000, 4000)) {
      val d = corpus(n).withColumnRenamed("doc_id", "id")
      d.count()
      val (cRw, tRw) = run(declarative, d)
      if (skipQuad) println(f"[simjoin] n=$n%5d pairs=$cRw%6d rewritten=$tRw%7.2f s")
      else {
        val (cNv, tNv) = run(naive, d)
        require(cRw == cNv, s"rewrite diverged at n=$n: $cRw vs $cNv")
        println(f"[simjoin] n=$n%5d pairs=$cRw%6d rewritten=$tRw%7.2f s quadratic=$tNv%7.2f s speedup=${tNv / tRw}%5.1fx")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Smoke: the Catalyst extension surface under REAL executor JVMs
  * (local-cluster) — the similarity-join rewrite fires, executors resolve
  * graft.functions codegen calls from their classpath, and the SQL
  * registry works on a cluster session. Diagnostic only.
  * Needs SPARK_HOME (see Sessions.localCluster).
  */
object ExtClusterSmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.localCluster(2, 4, 3072, appName = "graft-ext-smoke")
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id").as("id"),
        operators.Dedup.wordShingles(col("text"), 3).as("sh"))
    val q = d.as("a").crossJoin(d.as("b"))
      .filter(functions.TokenJaccardFunctions.token_jaccard(col("a.sh"), col("b.sh")) > 0.05 &&
        col("a.id") < col("b.id"))
    val plan = q.queryExecution.executedPlan.toString
    val quad = plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")
    val n = q.count()
    val sqlJ = spark.sql("SELECT graft_token_jaccard(array('a','b'), array('b','c')) AS j")
      .head().getDouble(0)
    val dbscan = spark.sql(
      "SELECT size(graft_filter_skills_dbscan(array('x'))) AS n").head().getInt(0)
    println(s"[ext-smoke] rewritten=${!quad} pairs=$n sql_jaccard=$sqlJ dbscan_empty=$dbscan")
    spark.stop()
  }
}

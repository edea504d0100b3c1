package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GraphMetrics

/** Scaling evidence for the iterative graph operators (PageRank
  * supersteps, BFS frontier propagation): same deterministic synthetic
  * graph at local[8] and local[32], interleaved min-of-N (the host's
  * steal storms make back-to-back levels unsound — BENCH_SCALING.md),
  * one JSON line.
  *
  * The graph: SPARK_GRAFT_EDGES edges (default 5M) over edges/10 nodes —
  * uniform hash endpoints plus a 1% hub stripe onto 16 nodes, so the
  * rank aggregation sees real key skew. Built with the same xxhash64
  * both levels, entirely in-engine (no files; generation is outside the
  * timed region via an eager cache).
  */
object GraphScale {

  def edges(spark: SparkSession, nEdges: Long): DataFrame = {
    val nNodes = math.max(nEdges / 10, 100L)
    spark.range(0, nEdges).select(
      when(pmod(col("id"), lit(100)) === 0,
        pmod(xxhash64(col("id"), lit(1)), lit(16)))
        .otherwise(pmod(xxhash64(col("id"), lit(2)), lit(nNodes))).as("src"),
      pmod(xxhash64(col("id"), lit(3)), lit(nNodes)).as("dst"))
  }

  def main(args: Array[String]): Unit = {
    val nEdges = sys.env.getOrElse("SPARK_GRAFT_EDGES", "5000000").toLong
    val triEdges = sys.env.getOrElse("SPARK_GRAFT_TRI_EDGES", "10000000").toLong
    val iters = sys.env.getOrElse("SPARK_GRAFT_PR_ITERS", "5").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val levels = Seq(8, 32)
    val pr = collection.mutable.Map(levels.map(_ -> List.empty[Double]): _*)
    val bfs = collection.mutable.Map(levels.map(_ -> List.empty[Double]): _*)
    val tri = collection.mutable.Map(levels.map(_ -> List.empty[Double]): _*)
    val lpa = collection.mutable.Map(levels.map(_ -> List.empty[Double]): _*)
    val sp = collection.mutable.Map(levels.map(_ -> List.empty[Double]): _*)
    val tc = collection.mutable.Map(levels.map(_ -> List.empty[Double]): _*)
    var maxSteal = -1.0
    (1 to reps).foreach { rep =>
      levels.foreach { cores =>
        val spark = Sessions.local(cores, appName = s"graft-graph-scale-$cores-r$rep")
        spark.sparkContext.setLogLevel("WARN")
        val e = edges(spark, nEdges).cache()
        e.count()
        // warm-up the join/agg codegen paths on a small slice
        GraphMetrics.pageRank(e.limit(50000), 2).count()
        val (_, m1) = Bench.measure(GraphMetrics.pageRank(e, iters).count())
        val seeds = e.select(col("src").as("node")).filter(col("node") < 16).distinct()
        val (_, m2) = Bench.measure(GraphMetrics.minHops(e, seeds, maxHops = 6).count())
        // LPA shares the superstep shape with PageRank but shuffles a
        // string-ish label column and argmaxes instead of summing
        val (_, m4) = Bench.measure(GraphMetrics.labelPropagation(e, iters = 3).count())
        // weighted relaxation from the hub stripe — node-scale dist frame
        val we = e.withColumn("w", pmod(xxhash64(col("src"), col("dst")), lit(7)) + 1)
        val (_, m5) = Bench.measure(GraphMetrics.minCost(we, seeds, maxIters = 4).count())
        e.unpersist()
        // bounded closure on the usage shape it exists for: length-8
        // chains (SPARQL p+ over a hierarchy), output ≈ 3.5 pairs/node —
        // NOT the hub graph, where all-pairs closure is inherently
        // quadratic output
        val ch = spark.range(0, nEdges)
          .where(pmod(col("id"), lit(8)) =!= 7)
          .select(col("id").as("src"), (col("id") + 1).as("dst"))
          .localCheckpoint()
        val (_, m6) = Bench.measure(
          graft.operators.GraphQuery.transitiveClosure(ch, maxHops = 7).count())
        val te = edges(spark, triEdges).localCheckpoint()
        val (_, m3) = Bench.measure(GraphMetrics.triangles(te).count())
        maxSteal = math.max(maxSteal,
          Seq(m1, m2, m3, m4, m5, m6).map(_.stealPct).max)
        pr(cores) ::= m1.sec
        bfs(cores) ::= m2.sec
        tri(cores) ::= m3.sec
        lpa(cores) ::= m4.sec
        sp(cores) ::= m5.sec
        tc(cores) ::= m6.sec
        spark.stop()
      }
    }
    def eff(byLevel: collection.Map[Int, List[Double]]): (Double, Double, Double) = {
      val s8 = byLevel(8).min; val s32 = byLevel(32).min
      (s8, s32, (s8 / s32) / 4.0)
    }
    val (p8, p32, pe) = eff(pr)
    val (b8, b32, be) = eff(bfs)
    val (t8, t32, te) = eff(tri)
    val (l8, l32, le) = eff(lpa)
    val (s8, s32, se) = eff(sp)
    val (c8, c32, ce) = eff(tc)
    println(
      f"""{"metric":"graph_scaling","edges":$nEdges,"pagerank":{"iters":$iters,"local8_sec":$p8%.2f,"local32_sec":$p32%.2f,"efficiency":$pe%.3f,"edges_per_sec_32":${nEdges * iters / p32}%.0f},"bfs":{"local8_sec":$b8%.2f,"local32_sec":$b32%.2f,"efficiency":$be%.3f},"triangles":{"edges":$triEdges,"local8_sec":$t8%.2f,"local32_sec":$t32%.2f,"efficiency":$te%.3f},"lpa":{"local8_sec":$l8%.2f,"local32_sec":$l32%.2f,"efficiency":$le%.3f},"mincost":{"local8_sec":$s8%.2f,"local32_sec":$s32%.2f,"efficiency":$se%.3f},"closure":{"local8_sec":$c8%.2f,"local32_sec":$c32%.2f,"efficiency":$ce%.3f},"max_steal_pct":$maxSteal%.1f}""")
  }
}

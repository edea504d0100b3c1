package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GraphQuery
import graft.operators.GraphQuery.PathExpr.{Plus, PlusAll, Pred}

/** A/B evidence for constant-endpoint property-path seeding
  * (GraphQuery.pathPairsFrom / transitiveClosureFrom): a point query
  * `<c> next+ ?x` evaluated (a) the round-4 way — full-graph fixpoint,
  * then filter src = c — and (b) seeded at c. The fixture is a forest
  * of CHAIN components (compSize nodes each), so the full closure
  * materializes K·M·(M+1)/2 pairs while c's reachable cone is at most
  * M−1 pairs: the seeded cost must track the CONE, not the graph.
  *
  * Two legs prove the scaling law:
  *   1. full-vs-seeded at the same graph (speedup = how much the
  *      filter-after-fixpoint strategy overpays);
  *   2. seeded at N nodes vs 4N nodes with the SAME component size —
  *      near-flat seeded time (cost rides the reachable set; only the
  *      per-superstep frontier⋈edges probe sees the bigger table).
  * Identical pair sets asserted on every run. Interleaved min-of-N at
  * local[32], steal-tracked, one JSON line (recorded in
  * BENCH_SCALING.md).
  */
object PathSeedScale {

  /** Chain forest: node v(i) → v(i+1) except at component boundaries. */
  def triples(spark: SparkSession, nNodes: Long, compSize: Long): DataFrame =
    spark.range(0, nNodes)
      .where(pmod(col("id") + 1, lit(compSize)) =!= 0 &&
        col("id") + 1 < nNodes)
      .select(concat(lit("v"), col("id")).as("subj"),
        lit("next").as("pred"),
        concat(lit("v"), col("id") + 1).as("obj"))

  def main(args: Array[String]): Unit = {
    val nNodes = sys.env.getOrElse("SPARK_GRAFT_NODES", "2000000").toLong
    val compSize = sys.env.getOrElse("SPARK_GRAFT_COMP", "64").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = Sessions.local(32, appName = "graft-path-seed-scale")
    spark.sparkContext.setLogLevel("WARN")

    val t1 = triples(spark, nNodes, compSize).localCheckpoint()
    val t4 = triples(spark, nNodes * 4, compSize).localCheckpoint()
    val n1 = t1.count(); val n4 = t4.count()
    // the seed: first node of a mid-graph component — cone = compSize-1
    val seedId = (nNodes / 2 / compSize) * compSize
    val seed = s"v$seedId"
    val expr = PlusAll(Pred("next"))
    def seedDf(s: SparkSession) = s.range(1).select(lit(seed).as("src"))

    def fullThenFilter(t: DataFrame): Long =
      GraphQuery.pathPairs(t, Plus(Pred("next"), compSize.toInt + 4))
        .where(col("src") === seed).count()
    def seeded(t: DataFrame): Long =
      GraphQuery.pathPairsFrom(t, expr, seedDf(spark)).count()

    // warm-up both shapes on a slice
    GraphQuery.pathPairsFrom(t1.limit(10000), expr, seedDf(spark)).count()

    var full = List.empty[Double]; var s1 = List.empty[Double]
    var s4 = List.empty[Double]; var maxSteal = -1.0
    var nFull = -1L; var nSeed1 = -1L; var nSeed4 = -1L
    (1 to reps).foreach { _ =>
      val (a, m1) = Bench.measure(seeded(t1))
      val (b, m2) = Bench.measure(seeded(t4))
      val (c, m3) = Bench.measure(fullThenFilter(t1))
      nSeed1 = a; nSeed4 = b; nFull = c
      require(a == c, s"seeded vs full-filtered pair sets differ: $a vs $c")
      require(a == b, s"cone must not depend on graph size: $a vs $b")
      s1 ::= m1.sec; s4 ::= m2.sec; full ::= m3.sec
      maxSteal = math.max(maxSteal,
        math.max(m1.stealPct, math.max(m2.stealPct, m3.stealPct)))
    }
    // SET equality once, untimed (ADVICE r5: the per-rep count equality is
    // weaker than the doc's "identical pair sets" claim) — exceptAll both
    // ways must be empty on the 1x graph
    val seededPairs = GraphQuery.pathPairsFrom(t1, expr, seedDf(spark))
      .select("src", "dst")
    val fullPairs = GraphQuery.pathPairs(t1, Plus(Pred("next"), compSize.toInt + 4))
      .where(col("src") === seed).select("src", "dst")
    require(seededPairs.exceptAll(fullPairs).isEmpty &&
        fullPairs.exceptAll(seededPairs).isEmpty,
      "seeded vs full-then-filter pair SETS differ")
    spark.stop()
    val (f, a, b) = (full.min, s1.min, s4.min)
    println(
      f"""{"metric":"path_seeding","edges_1x":$n1,"edges_4x":$n4,"cone_pairs":$nSeed1,"full_then_filter_sec":$f%.2f,"seeded_sec":$a%.2f,"seeded_4x_sec":$b%.2f,"speedup":${f / a}%.1f,"seeded_4x_ratio":${b / a}%.2f,"max_steal_pct":$maxSteal%.1f}""")
  }
}

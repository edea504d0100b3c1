package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GraphQuery
import graft.operators.GraphQuery.TriplePattern

/** A/B evidence for selectivity-driven BGP join ordering
  * (GraphQuery.orderPatterns): an adversarial pattern ORDER — the hub
  * predicate written FIRST — over a skewed synthetic triple table, run
  * both as the user wrote it (stats = None) and reordered (precomputed
  * BgpStats). Same bindings both ways (asserted); the reordered plan
  * starts from the 500-row predicate so the hub table is probed once by
  * a broadcast-sized prefix instead of materializing the full
  * hub ⋈ mid intermediate in the shuffle. Interleaved min-of-N at
  * local[32], steal-tracked, one JSON line (recorded in
  * BENCH_SCALING.md).
  *
  * Fixture (SPARK_GRAFT_TRIPLES total, default 20M): `mentions`
  * doc→entity covers ~99.7% of triples (the hub), `hq_in` entity→city
  * one per entity (~0.25%), `ceo_of` person→entity 500 rows. The
  * adversarial query: ?d mentions ?e . ?e hq_in ?c . ?p ceo_of ?e —
  * user order builds |mentions| rows before ceo_of ever filters.
  */
object BgpScale {

  def triples(spark: SparkSession, nMentions: Long, nEntities: Long): DataFrame = {
    val mentions = spark.range(0, nMentions).select(
      concat(lit("d"), pmod(xxhash64(col("id"), lit(1)), lit(nMentions / 4))).as("subj"),
      lit("mentions").as("pred"),
      concat(lit("e"), pmod(xxhash64(col("id"), lit(2)), lit(nEntities))).as("obj"))
    val hq = spark.range(0, nEntities).select(
      concat(lit("e"), col("id")).as("subj"),
      lit("hq_in").as("pred"),
      concat(lit("city"), pmod(col("id"), lit(200))).as("obj"))
    val ceo = spark.range(0, 500).select(
      concat(lit("p"), col("id")).as("subj"),
      lit("ceo_of").as("pred"),
      concat(lit("e"), col("id")).as("obj"))
    mentions.unionAll(hq).unionAll(ceo)
  }

  def main(args: Array[String]): Unit = {
    val nMentions = sys.env.getOrElse("SPARK_GRAFT_TRIPLES", "20000000").toLong
    // entity table sized ABOVE the broadcast threshold: user order must
    // then SHUFFLE the full hub table against it, while the reordered
    // plan reaches the hub only with a 500-binding broadcast probe —
    // the shape that decides survival at fact-scale
    val nEntities = math.max(nMentions / 10, 1000L)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val pattern = Seq( // adversarial: hub FIRST, cheapest LAST
      TriplePattern("?d", "mentions", "?e"),
      TriplePattern("?e", "hq_in", "?c"),
      TriplePattern("?p", "ceo_of", "?e"))
    var user = List.empty[Double]
    var opt = List.empty[Double]
    var statsSec = List.empty[Double]
    var maxSteal = -1.0
    val spark = Sessions.local(32, appName = "graft-bgp-scale")
    spark.sparkContext.setLogLevel("WARN")
    val t = triples(spark, nMentions, nEntities).localCheckpoint()
    val nTriples = t.count()
    // warm-up both join shapes on a slice
    GraphQuery.bgpMatch(t.limit(100000), pattern, None).count()
    val (st, mStats) = Bench.measure(GraphQuery.BgpStats.compute(t))
    var nUser = -1L
    var nOpt = -1L
    (1 to reps).foreach { _ =>
      val (a, m1) = Bench.measure(GraphQuery.bgpMatch(t, pattern, None).count())
      val (b, m2) = Bench.measure(GraphQuery.bgpMatch(t, pattern, Some(st)).count())
      nUser = a; nOpt = b
      require(a == b, s"ordering changed the bindings: $a vs $b")
      user ::= m1.sec; opt ::= m2.sec
      maxSteal = math.max(maxSteal, math.max(m1.stealPct, m2.stealPct))
    }
    statsSec ::= mStats.sec
    spark.stop()
    val (u, o) = (user.min, opt.min)
    println(
      f"""{"metric":"bgp_ordering","triples":$nTriples,"bindings":$nOpt,"user_order_sec":$u%.2f,"reordered_sec":$o%.2f,"speedup":${u / o}%.2f,"stats_sec":${statsSec.min}%.2f,"max_steal_pct":$maxSteal%.1f}""")
  }
}

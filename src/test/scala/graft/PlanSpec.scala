package graft

import graft.sources.TranscriptGen

/** Physical-plan assertions: the optimizations the engine depends on at
  * 100 TB must actually appear in the executed plan — broadcast joins for
  * every dim, predicate pushdown + column pruning into the parquet scans,
  * whole-stage codegen over the hot projections. `.explain`-and-iterate,
  * frozen as tests.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("dim joins broadcast (q02: nation/region sides)") {
    val p = planOf("q02_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("filter pushdown reaches the parquet scan (q01 shipdate)") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p.take(2000))
  }

  test("column pruning: fingerprint scan reads only doc_id,text") {
    val p = planOf("q14_fingerprint")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text") && !read.contains("n_chars"), read)
  }

  test("whole-stage codegen covers the clean projection; extract stays one narrow stage") {
    import spark.implicits._
    val turns = TranscriptGen.dataset(spark, 5)
    val p = operators.TurnExtract
      .extract(KgPipeline.cleanTurns(turns).withColumn("category",
        org.apache.spark.sql.functions.lit("description")))(spark)
      .queryExecution.executedPlan.toString
    // `*(n)` = codegen'd span containing the clean_text projection; the
    // extract projection uses higher-order functions (CodegenFallback by
    // design in Spark) but must stay shuffle-free and object-boundary-free
    assert(p.contains("clean_text"), p.take(1500))
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("clean_text")), p.take(1500))
    assert(!p.contains("Exchange"), "extract stage must be narrow")
    assert(!p.contains("DeserializeToObject") ||
      !p.linesIterator.exists(l => l.contains("extract_salary") && l.contains("Deserialize")),
      "no object boundary in the extract projection")
  }

  test("the per-turn hot path carries NO regex expression nodes") {
    import spark.implicits._
    val turns = TranscriptGen.dataset(spark, 5)
    val prepared = ml.SectionTagger.prepare(
      KgPipeline.cleanTurns(turns).toDF())
    val extract = operators.TurnExtract
      .extract(KgPipeline.cleanTurns(turns).withColumn("category",
        org.apache.spark.sql.functions.lit("description")))(spark)
    Seq("prepare" -> prepared, "extract" -> extract).foreach { case (n, df) =>
      val p = df.queryExecution.executedPlan.toString
      // any regexp_* / rlike Catalyst node would reintroduce the measured
      // intra-JVM java.util.regex collapse (BENCH_SCALING.md)
      Seq("RLIKE", "regexp_replace", "regexp_extract", "RegExpReplace",
        "RegExpExtract", "Like(").foreach { marker =>
        assert(!p.contains(marker), s"$n plan contains $marker")
      }
    }
  }

  test("full-corpus text-analysis scans carry no regex nodes") {
    // lang-ID, quality scoring, token counting, normalize and fingerprint
    // all run over EVERY document in a training pipeline (fingerprint
    // additionally feeds both dedup entry points); each regex kernel was
    // replaced by a native scanner with a fuzz-pinned Pattern twin
    // (has_cjk, translate() digit trick, ScanExprs round 3) — none may
    // regress to rlike/regexp_*.
    val kernels = Map(
      "q12_lang_id" -> "lang_id", "q33_lang_trigram" -> "lang_id_trigram",
      "q13_quality_score" -> "quality_score", "q10_normalize" -> "ascii_normalize",
      "q11_token_counts" -> "ws_token_count", "q14_fingerprint" -> "collapse_ws")
    kernels.foreach { case (q, kernel) =>
      val p = planOf(q)
      // StringSplit/split( too: split(lower(c), " ") is ALSO a
      // java.util.regex node, which this marker list originally missed
      Seq("RLIKE", "regexp_replace", "regexp_extract", "RegExpReplace",
        "RegExpExtract", "Like(", "StringSplit", "split(").foreach { marker =>
        assert(!p.contains(marker), s"$q plan contains $marker")
      }
      assert(p.contains(kernel), s"$q plan missing the regex-free kernel $kernel")
    }
  }

  test("partial aggregation (map-side combine) in the scoring groupBy") {
    import spark.implicits._
    val convSkills = Seq(("c1", "python programming")).toDF("conv_id", "skill")
    val p = operators.Scoring.sectorAndIsco(convSkills)(spark)
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate") && p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("graph family plans: broadcast vocab sizes, no cartesian anywhere") {
    // Negatives: the vocab-size join is an explicit broadcast; the draw
    // explode + vocab equi-join must never degrade to a cartesian
    val neg = planOf("q75_kg_negatives")
    assert(neg.contains("BroadcastHashJoin"), neg.take(2000))
    for ((name, p) <- Seq("q75" -> neg, "q78" -> planOf("q78_copurchase_edges"),
        "q86" -> planOf("q86_triangle_counts"),
        "q87" -> planOf("q87_link_prediction")))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$name: ${p.take(1200)}")
  }

  test("fusion runs on two hash aggregations, no window sort") {
    // the struct-min argmax must plan as partial-aggregated
    // HashAggregates — a Window node would mean the per-group sort the
    // operator exists to avoid
    val p = planOf("q83_fusion")
    assert(!p.contains("Window"), p.take(1500))
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      p.take(1500))
    assert(p.contains("partial_min") || p.contains("partial"),
      "map-side combine expected: " + p.take(1500))
  }

  test("AQE splits a planted hot-key join partition at runtime (skew join)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // session-level knobs so skew triggers at test scale (defaults need
    // 256 MB partitions); restored after — the same two knobs a real
    // deployment tunes (north_rule: "AQE skew handling tuned explicitly")
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "200k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      // one hot conversation (80% of all rows) + a uniform tail — the
      // planted-skew shape TranscriptGen.skewConvs models. The payload is
      // per-row and hash-random: shuffle skew is measured on COMPRESSED
      // map-output bytes, so a constant pad (foldable, and LZ4-collapsible)
      // never trips the threshold
      val left = spark.range(200000)
        .select(when(col("id") < 160000, lit("hot")).otherwise(concat(lit("c"), col("id"))).as("k"),
          md5(col("id").cast("string")).as("payload"))
      val right = spark.range(2000)
        .select(when(col("id") === 0, lit("hot")).otherwise(concat(lit("c"), col("id"))).as("k"),
          md5(col("id").cast("string")).as("rpayload"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame's own QueryExecution — the skew decision is
      // a runtime re-plan, so inspecting an unexecuted plan (or the
      // separate QueryExecution a .count() builds) sees only the initial one
      assert(joined.collect().length == 160000) // only the hot key intersects
      val executed = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      // string assertion: the final plan lives inside ResultQueryStage (a
      // leaf — collect() cannot descend into query stages)
      assert(executed.contains("skew=true") && executed.contains("skewed"),
        s"AQE did not mark the join as skew-handled:\n$executed")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}

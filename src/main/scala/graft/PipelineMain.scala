package graft

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.feature.StringIndexerModel
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.SectionTagger
import graft.model.Turn
import graft.operators._
import graft.sources.TranscriptGen

/** spark-submit driver: checkpointed, resumable stage orchestration
  * (mirrors the reference's execute_from/execute_to/execute_skip,
  * /root/reference/extract-info/ExtractMain.py:24-44). Each stage reads the
  * previous stage's table and writes its own — parquet here; the table
  * layout (one dir per stage, partition columns on the fact tables) is the
  * Iceberg design of SURVEY §7.1, with parquet standing in because the
  * sandbox classpath carries no Iceberg runtime.
  *
  * Usage:
  *   runMain graft.PipelineMain --out /tmp/kg --convs 1000 [--seed 42]
  *     [--from-stage s0] [--to-stage s6] [--skip s2,s3] [--cores 32]
  */
object PipelineMain {

  val stageNames = Seq("s0_transcripts", "s1_clean", "s2_model", "s3_extract",
    "s4_conv", "s5_entities", "s6_triples")

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    val out = a("out")
    val nConvs = a.getOrElse("convs", "1000").toLong
    val seed = a.getOrElse("seed", "42").toLong
    val from = a.getOrElse("from-stage", "s0")
    val to = a.getOrElse("to-stage", "s6")
    val skip = a.getOrElse("skip", "").split(',').filter(_.nonEmpty).toSet
    val cores = a.getOrElse("cores", "32").toInt
    val runId = a.getOrElse("run-id", s"run-${System.currentTimeMillis()}")

    implicit val spark: SparkSession = Sessions.local(cores, appName = "graft-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val fromIdx = stageNames.indexWhere(_.startsWith(from))
    val toIdx = stageNames.indexWhere(_.startsWith(to))
    require(fromIdx >= 0 && toIdx >= fromIdx, s"bad stage range $from..$to")
    def active(s: String): Boolean = {
      val i = stageNames.indexOf(s)
      i >= fromIdx && i <= toIdx && !skip.exists(s.startsWith)
    }

    def path(s: String) = s"$out/$s"

    def lineage(stage: String, df: DataFrame): Unit = {
      val rows = df.groupBy(spark_partition_id().as("partition_id"))
        .agg(count(lit(1)).as("rows_out"))
        .withColumn("run_id", lit(runId)).withColumn("stage", lit(stage))
      rows.write.mode(SaveMode.Append).parquet(s"$out/lineage")
      val total = rows.agg(sum("rows_out")).as[Long].head()
      println(s"[graft] $stage rows_out=$total -> ${path(stage)}")
    }

    // ---- s0: synthesize transcripts (the Iceberg input table) ----
    if (active("s0_transcripts")) {
      val t = TranscriptGen.dataset(spark, nConvs, seed)
      t.write.mode(SaveMode.Overwrite).parquet(path("s0_transcripts"))
      lineage("s0_transcripts", spark.read.parquet(path("s0_transcripts")))
    }

    // ---- s1: clean chain ----
    if (active("s1_clean")) {
      val turns = spark.read.parquet(path("s0_transcripts")).as[Turn]
      KgPipeline.cleanTurns(turns).write.mode(SaveMode.Overwrite).parquet(path("s1_clean"))
      lineage("s1_clean", spark.read.parquet(path("s1_clean")))
    }

    // ---- s2: train + persist the section tagger ----
    if (active("s2_model")) {
      val trained = SectionTagger.train(KgPipeline.taggerTrainingFrame(spark, nConvs = 300, seed = seed))
      trained.model.write.overwrite().save(path("s2_model"))
      println(s"[graft] s2_model saved -> ${path("s2_model")}")
    }

    def loadTagger(): SectionTagger.Trained = {
      val m = PipelineModel.load(path("s2_model"))
      val labels = m.stages.collectFirst { case s: StringIndexerModel => s.labelsArray(0) }.get
      SectionTagger.Trained(m, labels)
    }

    // ---- s3: tag + per-turn mention extraction ----
    if (active("s3_extract")) {
      val cleaned = spark.read.parquet(path("s1_clean"))
      val tagged = SectionTagger.predict(loadTagger(), cleaned)
      val extractDates = a.getOrElse("extract-dates", "false").toBoolean // X5 flag
      TurnExtract.extract(tagged, extractDates)
        .write.mode(SaveMode.Overwrite).parquet(path("s3_extract"))
      lineage("s3_extract", spark.read.parquet(path("s3_extract")))
    }

    // ---- s4: per-conversation resolve ----
    if (active("s4_conv")) {
      val extracted = spark.read.parquet(path("s3_extract"))
      ConvFinalize.run(extracted).write.mode(SaveMode.Overwrite).parquet(path("s4_conv"))
      lineage("s4_conv", spark.read.parquet(path("s4_conv")))
    }

    // ---- s5: entity linking over org mentions ----
    if (active("s5_entities")) {
      val convs = spark.read.parquet(path("s4_conv"))
      val mentions = convs.select(explode(col("orgs")).as("surface"))
      Linking.canonicalize(mentions).write.mode(SaveMode.Overwrite).parquet(path("s5_entities"))
      lineage("s5_entities", spark.read.parquet(path("s5_entities")))
    }

    // ---- s6: scoring + triple emission, partitioned by pred ----
    if (active("s6_triples")) {
      val convs = spark.read.parquet(path("s4_conv")).as[ConvExtract]
      val convSkills = convs.select(col("conv_id"), explode(col("skills")).as("skill"))
      val si = Scoring.sectorAndIsco(convSkills).cache()
      val sectors = si.select("conv_id", "sector")
      val estimates = Scoring.estimates(
        si.select("conv_id", "isco3"),
        convs.toDF().select(col("conv_id"), col("location")).filter(col("location").isNotNull))
      val canon = spark.read.parquet(path("s5_entities"))
      val triples = TripleEmit.run(convs, sectors, estimates, canon)
      triples.write.mode(SaveMode.Overwrite).partitionBy("pred").parquet(path("s6_triples"))
      lineage("s6_triples", spark.read.parquet(path("s6_triples")))
      // per-pred metrics
      spark.read.parquet(path("s6_triples")).groupBy("pred").count()
        .withColumn("run_id", lit(runId)).withColumn("stage", lit("s6_triples"))
        .write.mode(SaveMode.Append).parquet(s"$out/metrics")
      // wide-row TSV export (reference MySQL/TSV sink parity, S5/S6)
      WideExport.exportTsv(WideExport.widen(spark.read.parquet(path("s6_triples"))),
        path("s6_wide_tsv"))
      println(s"[graft] s6_wide_tsv -> ${path("s6_wide_tsv")}")
    }

    spark.stop()
  }

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
}

package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.SectionTagger
import graft.model.{Triple, Turn}
import graft.operators._
import graft.sources.TranscriptGen

/** End-to-end dataflow S0→S6 (SURVEY §7.1). Stage functions are pure
  * Dataset transforms so the checkpointing driver (graft.PipelineMain) can
  * materialize any prefix and resume from it.
  */
object KgPipeline {

  /** S1 — canonical clean chain as one codegen'd projection (the
    * precompiled clean_text expression; the pure-Column chain it is pinned
    * against lives in operators.CleanText).
    */
  def cleanTurns(turns: Dataset[Turn]): DataFrame =
    turns.toDF().withColumn("text_clean",
      graft.functions.CleanFunctions.clean_text(col("text")))

  /** Training frame for the tagger: generator-labeled turns from a conv-id
    * region disjoint from any evaluation range (the reference trains on a
    * separate annotated corpus, SURVEY §2.5).
    */
  def taggerTrainingFrame(spark: SparkSession, nConvs: Int = 300,
      firstConv: Long = 1000000L, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val labeled = spark.range(firstConv, firstConv + nConvs)
      .flatMap(i => TranscriptGen.labeledTurnsFor(i, seed).map { case (t, c) => (t.text, c) })
      .toDF("text", "category")
    labeled.withColumn("text_clean", graft.functions.CleanFunctions.clean_text(col("text")))
      .select("text_clean", "category")
      // pin partition assignment AND in-partition order so model fitting
      // (treeAggregate fold order, per-partition sampling) is bit-identical
      // across parallelism levels — the q23/q31 golden oracles rely on it
      .repartition(8, col("text_clean"))
      .sortWithinPartitions("text_clean", "category")
  }

  /** S2-S6 from cleaned turns to triples. `extractDates` is the X5 flag
    * (reference ships it disabled — ExtractInfo.py:131-132).
    *
    * `clusteredConv = true` (default) resolves conversations via
    * [[ConvFinalize.runClustered]] — every caller of this dataflow feeds
    * conv-clustered, turn-sorted input (transcript tables sorted by
    * (conv_id, turn_idx), the generator, the stage checkpoints), and the
    * clustered path keeps the per-turn payload out of the shuffle while
    * throwing (never corrupting) on contract violations. Pass false for
    * arbitrarily-ordered inputs.
    */
  def triplesFromCleaned(cleaned: DataFrame, tagger: SectionTagger.Trained,
      extractDates: Boolean = false, clusteredConv: Boolean = true)(
      implicit spark: SparkSession): Dataset[Triple] = {
    val tagged = SectionTagger.predict(tagger, cleaned)
    val extracted = TurnExtract.extract(tagged, extractDates)
    val convs = (if (clusteredConv) ConvFinalize.runClustered(extracted)
                 else ConvFinalize.run(extracted)).cache()

    val convSkills = convs.select(col("conv_id"), explode(col("skills")).as("skill"))
    val si = Scoring.sectorAndIsco(convSkills).cache()
    val convLoc = convs.toDF().select(col("conv_id"), col("location"))
      .filter(col("location").isNotNull)
    // sector + salary estimate resolved against si in ONE conv-scale join
    // chain (si ⟕ convLoc ⟕ broadcast dim) instead of two separate frames
    // each re-joined to convs — TripleEmit.runEnriched then pays a single
    // conv-scale left join (2 conv joins total where round 5 paid 3; the
    // left joins preserve exactly the inner-join estimate rows because a
    // missed location or dim key just leaves estimated_salary null)
    val enriched = si.select(col("conv_id"), col("sector"), col("isco3"))
      .join(convLoc, Seq("conv_id"), "left")
      .join(broadcast(Scoring.estimateDim), Seq("location", "isco3"), "left")
      .select(col("conv_id"), col("sector"), col("estimated_salary"))

    val orgMentions = convs.toDF().select(explode(col("orgs")).as("surface"))
    val orgCanonical = Linking.canonicalize(orgMentions)

    TripleEmit.runEnriched(convs, enriched, orgCanonical)
  }

  def computeTriples(turns: Dataset[Turn], tagger: SectionTagger.Trained,
      extractDates: Boolean = false, clusteredConv: Boolean = true)(
      implicit spark: SparkSession): Dataset[Triple] =
    triplesFromCleaned(cleanTurns(turns), tagger, extractDates, clusteredConv)
}

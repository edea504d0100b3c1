package graft

import org.apache.spark.sql.functions._

import graft.golden.GoldenPipeline
import graft.ml.SectionTagger
import graft.sources.TranscriptGen

/** X5 end-to-end: with the flag ON the pipeline emits the planted
  * start/deadline dates (golden-derived, P/R gate); with the flag OFF —
  * the reference's shipped config — no date triples appear at all.
  */
class DateExtractSpec extends SparkSpec {

  test("flag-on pipeline recovers planted start/deadline dates; flag-off emits none") {
    val nConvs = 40
    val turns = TranscriptGen.dataset(spark, nConvs, seed = 42L, skewConvs = 0, skewTurns = 0)
    val tagger = SectionTagger.train(KgPipeline.taggerTrainingFrame(spark, nConvs = 150))

    val on = KgPipeline.computeTriples(turns, tagger, extractDates = true)
      .filter(col("pred").isin("start_date", "deadline_date"))
      .collect().map(t => (t.subj, t.pred, t.obj)).toSet
    val off = KgPipeline.computeTriples(turns, tagger)
      .filter(col("pred").isin("start_date", "deadline_date"))
      .count()
    assert(off == 0L, "flag-off parity: no date triples")

    val golden = (0L until nConvs)
      .flatMap(i => GoldenPipeline.triplesFor(
        TranscriptGen.labeledTurnsFor(i, 42L), s => s, extractDates = true))
      .filter(t => t.pred == "start_date" || t.pred == "deadline_date")
      .map(t => (t.subj, t.pred, t.obj)).toSet

    assert(golden.nonEmpty, "fixtures must plant dates")
    val tp = (on intersect golden).size.toDouble
    val precision = if (on.isEmpty) 0.0 else tp / on.size
    val recall = tp / golden.size
    info(f"date triples: P=$precision%.3f R=$recall%.3f (${on.size} emitted / ${golden.size} golden)")
    assert(precision >= 0.9 && recall >= 0.9)
  }
}

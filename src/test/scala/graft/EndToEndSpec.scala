package graft

import graft.golden.GoldenPipeline
import graft.ml.SectionTagger
import graft.model.Triple
import graft.sources.TranscriptGen

/** The correctness gate (BASELINE.json): distributed pipeline vs the pure
  * golden derivation at triple-set precision AND recall ≥ 0.95, plus the
  * per-turn text-equality invariant under (conv_id, turn_idx) order.
  */
class EndToEndSpec extends SparkSpec {

  private val nConvs = 120
  private val skewConvs = 2
  private val skewTurns = 120

  test("pipeline triples match golden at P/R >= 0.95") {
    import spark.implicits._
    val turns = TranscriptGen.dataset(spark, nConvs, seed = 42L, skewConvs, skewTurns)
    val tagger = SectionTagger.train(KgPipeline.taggerTrainingFrame(spark, nConvs = 200))
    val got: Set[Triple] = KgPipeline.computeTriples(turns, tagger).collect().toSet
    val want: Set[Triple] =
      GoldenPipeline.allTriples(nConvs.toLong, 42L, skewConvs, skewTurns).toSet

    val tp = (got intersect want).size.toDouble
    val precision = if (got.nonEmpty) tp / got.size else 0.0
    val recall = if (want.nonEmpty) tp / want.size else 0.0
    val missing = (want diff got).toSeq.sortBy(t => (t.subj, t.pred)).take(15)
    val spurious = (got diff want).toSeq.sortBy(t => (t.subj, t.pred)).take(15)
    info(f"precision=$precision%.4f recall=$recall%.4f got=${got.size} want=${want.size}")
    missing.foreach(t => info(s"MISSING  $t"))
    spurious.foreach(t => info(s"SPURIOUS $t"))
    assert(precision >= 0.95, f"precision $precision%.4f < 0.95")
    assert(recall >= 0.95, f"recall $recall%.4f < 0.95")
  }

  test("per-turn text equality under (conv_id, turn_idx) ordering") {
    import spark.implicits._
    val turns = TranscriptGen.dataset(spark, 20, seed = 42L, 1, 50)
    val carried = KgPipeline.cleanTurns(turns)
      .select("conv_id", "turn_idx", "text")
      .as[(String, Int, String)].collect()
      .sortBy(t => (t._1, t._2))
    val original = (0 until 20).flatMap(i => TranscriptGen.turnsFor(i.toLong, 42L, 1, 50))
      .map(t => (t.conv_id, t.turn_idx, t.text))
      .sortBy(t => (t._1, t._2))
    assert(carried.toSeq == original)
  }
}

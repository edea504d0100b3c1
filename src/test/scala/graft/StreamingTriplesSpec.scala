package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ml.SectionTagger
import graft.model.{Triple, Turn}
import graft.operators.{ConvFinalize, Linking, TurnExtract}
import graft.sources.TranscriptGen
import graft.streaming.StreamingTriples

/** Streaming end-to-end KG construction vs the batch path: a conversation
  * completed by event-time timeout must emit exactly the triples the batch
  * pipeline derives for it — same clean/tag/extract expressions, same
  * ConvFinalize kernel, same TripleEmit body, pure scoring twins. Orgs are
  * surface-level in streaming (canonicalization is cross-conv); equality
  * is shown through the batch-side canonical map.
  */
class StreamingTriplesSpec extends SparkSpec {

  test("conversation timeout emits batch-identical triples") {
    val nConvs = 20
    val (streamed, batch, canon) = StreamingTriples.parityRun(nConvs)
    assert(streamed.nonEmpty, "no conversations completed")
    assert(streamed.map(_.subj).size >= nConvs - 1, "most conversations must complete")

    def nonOrg(s: Set[Triple]) = s.filterNot(_.pred == "hiring_organization")
    assert(nonOrg(streamed) == nonOrg(batch),
      s"non-org triples diverged: only-stream=${nonOrg(streamed) -- nonOrg(batch)} " +
        s"only-batch=${nonOrg(batch) -- nonOrg(streamed)}")

    val streamedOrgsCanon = streamed.filter(_.pred == "hiring_organization")
      .map(t => Triple(t.subj, t.pred, canon.getOrElse(t.obj, t.obj)))
    assert(streamedOrgsCanon == batch.filter(_.pred == "hiring_organization"),
      "org triples diverged after applying the batch canonical map")
  }

  test("long gap + lateness still flushes every conversation (derived offsets)") {
    // gap 25 min + lateness 10 min exceeds the old hardcoded 10/20-minute
    // nudges: before flushOffsetsMs the newest conversations never timed
    // out and their triples were silently missing with exit 0
    val (streamed, batch, _) =
      StreamingTriples.parityRun(4, gapMs = 25L * 60 * 1000, lateness = "10 minutes")
    def nonOrg(s: Set[Triple]) = s.filterNot(_.pred == "hiring_organization")
    assert(nonOrg(streamed) == nonOrg(batch),
      s"missing=${(nonOrg(batch) -- nonOrg(streamed)).take(5)}")
  }

  test("out-of-order in-lateness turns never lower the timeout (single emission)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val tagger = SectionTagger.train(KgPipeline.taggerTrainingFrame(spark, nConvs = 120))
    def min(m: Double) = new Timestamp((m * 60000L).toLong)
    val base = TranscriptGen.turnsFor(5L, 42L, 0, 0)
    // conv X: turns re-timestamped at minutes 0..3, except one held back
    val xTurns = base.zipWithIndex.map { case (t, i) =>
      t.copy(conv_id = "convX", ts = min(i * 3.0 / math.max(base.size - 1, 1)))
    }
    val held = xTurns(1) // ts ~1 min — will arrive LATE but within lateness
    val first = xTurns.filterNot(_ eq held)

    val stream = MemoryStream[Turn]
    val query = StreamingTriples.triplesStream(stream.toDF(), tagger,
        gapMs = 10 * 60000L, lateness = "30 minutes")
      .writeStream.format("memory").queryName("stream_ooo")
      .outputMode("append").start()
    try {
      stream.addData(first)                      // timeout -> last + 10min = ~13min
      query.processAllAvailable()
      stream.addData(held)                       // OLD ts: must NOT lower the timeout
      query.processAllAvailable()
      // advance watermark to ~12min: between the buggy lowered timeout
      // (held.ts+10min ~ 11min) and the correct one (~13min)
      stream.addData(Turn("wm", 0, "user", "x", null, min(42)))
      query.processAllAvailable()
      stream.addData(Turn("wm", 1, "user", "x", null, min(42.5)))
      query.processAllAvailable()
      // a further convX turn still inside the true gap — with the bug the
      // conv already emitted and this would re-open state -> split emission
      stream.addData(xTurns.head.copy(turn_idx = 99, ts = min(12.5)))
      query.processAllAvailable()
      // now flush everything
      stream.addData(Turn("wm", 2, "user", "x", null, min(120)))
      query.processAllAvailable()
      stream.addData(Turn("wm", 3, "user", "x", null, min(121)))
      query.processAllAvailable()

      val emitted = spark.table("stream_ooo").as[Triple].collect()
        .filter(_.subj == "convX")
      // batch truth over the SAME full turn set (incl. the idx-99 extra)
      val full = (xTurns :+ xTurns.head.copy(turn_idx = 99, ts = min(12.5))).toDS()
      val batchTriples = KgPipeline.computeTriples(full, tagger).collect()
        .filter(_.subj == "convX")
      def nonOrg(t: Seq[Triple]) = t.filterNot(_.pred == "hiring_organization").toSet
      // single complete emission: the streamed multiset has no duplicates
      // and matches batch exactly on non-org preds
      assert(emitted.length == emitted.distinct.length, "split emission produced duplicates")
      assert(nonOrg(emitted.toSeq) == nonOrg(batchTriples.toSeq),
        s"partial emission: stream=${nonOrg(emitted.toSeq)} batch=${nonOrg(batchTriples.toSeq)}")
    } finally query.stop()
  }

  test("sectorIscoPure replicates the batch join's zero-mass edge") {
    import spark.implicits._
    import graft.operators.Scoring
    import graft.sources.Dims
    // taxonomy-orphan labels (in the skill dict but in NO occupation's
    // lists) produce NO weight rows -> batch inner join emits no row ->
    // the pure twin must return None, not a fabricated head-node sector
    val orphans = Dims.skills.map(_.label).filterNot(l =>
      Dims.occupations.exists(o => (o.essential ++ o.optional).contains(l)))
    assert(orphans.nonEmpty, "fixture promises at least one orphan skill")
    orphans.foreach(l => assert(Scoring.sectorIscoPure(Seq(l)).isEmpty, l))
    assert(Scoring.sectorIscoPure(Nil).isEmpty)
    // and on a real skill set the pure twin equals the distributed join
    val sk = Dims.occupationByIsco("251").essential
    val batchRow = Scoring.sectorAndIsco(sk.map(s => ("c1", s)).toDF("conv_id", "skill"))
      .as[(String, String, String)].head()
    assert(Scoring.sectorIscoPure(sk).contains((batchRow._2, batchRow._3)))
    // orphan + real mix: the orphan adds nothing, result unchanged
    assert(Scoring.sectorIscoPure(orphans.head +: sk) == Scoring.sectorIscoPure(sk))
  }

  test("completeConv is deterministic and state leaves after timeout emission") {
    import spark.implicits._
    // pure-kernel determinism: same buffered turns -> same triples
    val turns = TranscriptGen.turnsFor(3L, 42L, 0, 0)
    val tagger = SectionTagger.train(KgPipeline.taggerTrainingFrame(spark, nConvs = 120))
    val extracted = TurnExtract.extract(SectionTagger.predict(tagger,
      KgPipeline.cleanTurns(turns.toDS())))
    val slims = extracted
      .select("conv_id", "turn_idx", "tool", "text", "emp_groups", "locations",
        "orgs", "edu_phrases", "sal", "start_dates", "deadline_dates")
      .as[ConvFinalize.SlimTurn].collect().toSeq
    val a = StreamingTriples.completeConv(turns.head.conv_id, slims)
    val b = StreamingTriples.completeConv(turns.head.conv_id, slims)
    assert(a == b && a.nonEmpty)
    // and the buffered-unsorted case matches (finalizeConv sorts by turn_idx)
    val c = StreamingTriples.completeConv(turns.head.conv_id, slims.reverse)
    assert(c == a)
  }
}

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
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val nConvs = 20
    val allTurns = (0L until nConvs.toLong).flatMap(i => TranscriptGen.turnsFor(i, 42L, 0, 0))
    val tagger = SectionTagger.train(KgPipeline.taggerTrainingFrame(spark, nConvs = 120))

    // batch truth + the batch canonical map (surface -> canonical)
    val batch = KgPipeline.computeTriples(allTurns.toDS(), tagger).collect().toSet
    val convs = ConvFinalize.run(
      TurnExtract.extract(SectionTagger.predict(tagger,
        KgPipeline.cleanTurns(allTurns.toDS()))))
    val canon: Map[String, String] = Linking.canonicalize(
        convs.toDF().select(explode(col("orgs")).as("surface")))
      .select("surface", "canonical").as[(String, String)].collect().toMap

    val stream = MemoryStream[Turn]
    val query = StreamingTriples.triplesStream(stream.toDF(), tagger,
        gapMs = 60000L, lateness = "1 minute")
      .writeStream.format("memory").queryName("stream_triples")
      .outputMode("append").start()
    try {
      stream.addData(allTurns)
      query.processAllAvailable()
      val maxTs = allTurns.map(_.ts.getTime).max
      // watermark advances after the batch that reads the new max event
      // time, and timeouts fire in the batch AFTER that — two nudges
      stream.addData(Turn("dummy", 0, "user", "x", null, new Timestamp(maxTs + 10 * 60000L)))
      query.processAllAvailable()
      stream.addData(Turn("dummy", 1, "user", "x", null, new Timestamp(maxTs + 20 * 60000L)))
      query.processAllAvailable()

      val streamed = spark.table("stream_triples").as[Triple].collect().toSet
        .filterNot(_.subj == "dummy")
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
    } finally query.stop()
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

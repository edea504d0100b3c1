package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ml.SectionTagger
import graft.model.Triple
import graft.operators.{ConvExtract, ConvFinalize, ConvFull, SalStruct, TripleEmit, TurnExtract}
import graft.rules.DictRules

/** Streaming KG construction end-to-end: turns stream in, conversations
  * accumulate in keyed state, and when a conversation goes quiet (no turn
  * for `gapMs` of EVENT time, bounded by the watermark) its triples are
  * emitted — built from the SAME kernels as the batch path, so a completed
  * conversation produces bit-identical non-org triples either way:
  *
  *   clean (compiled expression) → tag (compiled LR serve) → per-turn
  *   extraction (TurnExtract) → stateful buffer per conv_id
  *   (flatMapGroupsWithState, event-time timeout) → ConvFinalize
  *   .finalizeConv → pure sector/isco/estimate twins (differential-pinned
  *   equal to the batch broadcast joins in OperatorSpec) →
  *   TripleEmit.convTriples.
  *
  * The one documented divergence: `hiring_organization` objects are the
  * RAW surfaces here — canonicalization is a cross-conversation
  * computation (LSH blocking + connected components over all mentions)
  * that has no bounded-state streaming form; the batch compactor
  * re-canonicalizes (the standard lambda split). StreamingTriplesSpec
  * proves batch equality by applying the batch-side canonical map to the
  * streamed surfaces.
  *
  * Scale: state per conversation is its SlimTurn buffer — the same payload
  * the batch shuffle carries per conv — and completed conversations leave
  * state at the watermark, so state size is O(active conversations), not
  * O(stream length).
  */
object StreamingTriples {

  /** ConvFinalize.SlimTurn + the event-time column, in one flat encoder. */
  final case class SlimTs(
      conv_id: String, turn_idx: Int, tool: String, text: String,
      emp_groups: Seq[String], locations: Seq[String], orgs: Seq[String],
      edu_phrases: Seq[String], sal: Option[SalStruct],
      start_dates: Seq[String], deadline_dates: Seq[String], ts: Timestamp) {
    def slim: ConvFinalize.SlimTurn = ConvFinalize.SlimTurn(conv_id, turn_idx,
      tool, text, emp_groups, locations, orgs, edu_phrases, sal,
      start_dates, deadline_dates)
  }

  final case class ConvBuf(turns: Seq[ConvFinalize.SlimTurn])

  /** Pure conv-level completion: batch ConvFinalize kernel + the pure
    * scoring twins + the shared TripleEmit body + surface-org triples.
    */
  def completeConv(convId: String, turns: Seq[ConvFinalize.SlimTurn]): Seq[Triple] = {
    val c: ConvExtract = ConvFinalize.finalizeConv(convId, turns)
    val sector = if (c.skills.nonEmpty) Some(DictRules.sector(c.skills)) else None
    val estimate =
      if (c.skills.nonEmpty) c.location.flatMap(l => DictRules.estimateSalary(c.skills, Some(l)))
      else None
    val full = ConvFull(c.conv_id, c.title, c.skills, c.employment, c.location,
      c.education, c.sal_values, c.currencies, c.work_hours, c.tools,
      c.start_dates, c.deadline_dates, sector, estimate)
    TripleEmit.convTriples(full) ++
      c.orgs.map(s => Triple(convId, "hiring_organization", s))
  }

  /** The streaming pipeline: `turns` must carry the input_hint columns
    * (conv_id, turn_idx, role, text, tool, ts). Emits each conversation's
    * triples once, when the watermark passes its last turn + gapMs.
    */
  def triplesStream(turns: DataFrame, tagger: SectionTagger.Trained,
      gapMs: Long = 30L * 60 * 1000, lateness: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[Triple] = {
    import spark.implicits._
    val cleaned = turns.withColumn("text_clean",
      graft.functions.CleanFunctions.clean_text(col("text")))
    val tagged = SectionTagger.predict(tagger, cleaned)
    val extracted = TurnExtract.extract(tagged)
    extracted
      .select("conv_id", "turn_idx", "tool", "text", "emp_groups", "locations",
        "orgs", "edu_phrases", "sal", "start_dates", "deadline_dates", "ts")
      .as[SlimTs]
      .withWatermark("ts", lateness)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (convId: String, it: Iterator[SlimTs], state: GroupState[ConvBuf]) => {
          if (state.hasTimedOut) {
            val buf = state.get.turns
            state.remove()
            completeConv(convId, buf).iterator
          } else {
            val incoming = it.toSeq
            val buf = state.getOption.map(_.turns).getOrElse(Seq.empty) ++
              incoming.map(_.slim)
            state.update(ConvBuf(buf))
            val maxTs = incoming.map(_.ts.getTime).max
            // timeout must sit beyond the current watermark or the runtime
            // rejects it; a conversation whose turns are all older than
            // watermark+gap completes at the next watermark advance
            state.setTimeoutTimestamp(
              math.max(maxTs + gapMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
        })
  }
}

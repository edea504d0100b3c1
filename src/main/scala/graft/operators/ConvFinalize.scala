package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.rules.{DictRules, Rules}
import graft.sources.Dims

/** Per-conversation resolution result (S5 input). `skills` are the
  * X14-filtered preferred labels, lowercase (capitalization happens at
  * triple emission like the reference's `skill.capitalize()`,
  * extractor.py:87-90).
  */
final case class ConvExtract(
    conv_id: String,
    title: String,
    skills: Seq[String],
    employment: Option[String],
    location: Option[String],
    education: Option[String],
    sal_values: Seq[Double],
    currencies: Seq[String],
    work_hours: Option[Int],
    orgs: Seq[String],
    tools: Seq[String],
    start_dates: Seq[String],
    deadline_dates: Seq[String])

/** Thrown (from executors) when input rows violate the clustered/salted
  * partitioning contract — duplicated, interleaved, or disordered turns.
  * A dedicated type so [[graft.PipelineMain]]'s salted-path fallback can
  * match contract violations by CLASS (or class name inside a
  * Spark-wrapped message) instead of message substrings, which would also
  * match unrelated failures whose stack traces merely mention
  * ConvFinalize (OOM, codegen errors, corrupt reads).
  */
final class ConvContractViolation(msg: String) extends IllegalStateException(msg)

/** S5 — the single fact-scale shuffle of the pipeline: group turns by
  * conv_id and resolve per-conv facts (A1-A5 merges + the whole-document
  * dictionary branch X11-X14). Order-sensitivity is pinned by sorting on
  * turn_idx inside the group (collect order post-shuffle is otherwise
  * nondeterministic — SURVEY §7.4).
  *
  * Skew (north_star: "salted joins for skew-heavy conversation keys"):
  * the aggregation is TWO-LEVEL. Phase 1 groups by the salted key
  * `(conv_id, turn_idx / bucketSize)` — every group is bounded by
  * `bucketSize` turns, so a 10^6-turn monster conversation never
  * materializes as one in-memory Seq. Phase 2 merges the ordered bucket
  * partials per conv_id; every A1-A5 fold is merge-associative over
  * contiguous turn ranges (the salary short-circuit carries its `broke`
  * flag in the partial, ordered-distinct sets merge by filtered concat,
  * the text join is plain concatenation). The single-phase fold
  * (`finalizeConv`) is kept verbatim as the differential oracle —
  * ConvFinalizeSpec pins `run == runSinglePhase` on skewed fixtures.
  */
object ConvFinalize {

  /** Shuffle payload: only what conv-level resolution needs (the cleaned
    * text, role and category columns stay behind — ~45% fewer shuffle
    * bytes at fact scale).
    */
  final case class SlimTurn(
      conv_id: String, turn_idx: Int, tool: String, text: String,
      emp_groups: Seq[String], locations: Seq[String], orgs: Seq[String],
      edu_phrases: Seq[String], sal: Option[SalStruct],
      start_dates: Seq[String], deadline_dates: Seq[String])

  def finalizeConv(convId: String, turnsUnsorted: Seq[SlimTurn]): ConvExtract = {
    val turns = turnsUnsorted.sortBy(_.turn_idx)

    // employment (A1 else-branch union + A5 priority-min)
    val empGroups = {
      val acc = scala.collection.mutable.LinkedHashSet.empty[String]
      turns.foreach(_.emp_groups.foreach(acc += _))
      acc.toSeq
    }
    val employment = Rules.priorityEmployment(empGroups)

    // location (A1 concat of per-chunk lists + A3 mode, first-occurrence tie)
    val location = Rules.modeLocation(turns.flatMap(_.locations))

    // education (A1 union + degree mapping + priority, ProcessAndMergeInfo.py:490-528)
    val eduPhrases = {
      val acc = scala.collection.mutable.LinkedHashSet.empty[String]
      turns.foreach(_.edu_phrases.foreach(acc += _))
      acc.toSeq
    }
    val education = Rules.priorityDegree(eduPhrases)

    // base salary (A1 short-circuit: first currency-associated chunk wins,
    // ProcessAndMergeInfo.py:176-186)
    var salVals = Seq.empty[Double]
    var broke = false
    turns.foreach { t =>
      t.sal.foreach { s =>
        if (!broke && (s.values.nonEmpty || s.cur_assoc.nonEmpty)) {
          if (s.cur_assoc.nonEmpty) { salVals = s.cur_assoc; broke = true }
          else if (s.sw_kw)
            salVals = salVals ++ s.values.distinct.filterNot(salVals.contains)
        }
      }
    }
    val currencies = turns.flatMap(_.sal.map(_.currencies).getOrElse(Seq.empty)).distinct

    // whole-document branch: X11 work hours + X12/X13/X14 dictionary ops
    val convText = turns.map(_.text).mkString(". ")
    val docClean = Rules.cleanString(convText)
    val spans = Rules.extractWorkHourSpans(docClean)
    val workHours =
      if (spans.isEmpty) None
      else Some(Rules.maxWorkHours(Rules.cleanedWorkHours(spans)))

    val pre = DictRules.preprocess(convText).toLowerCase
    val title = DictRules.extractTitle(pre)
    val skills = DictRules.filterSkillsByTitle(title, DictRules.extractSkills(pre))

    ConvExtract(
      conv_id = convId,
      title = title,
      skills = skills,
      employment = employment,
      location = location,
      education = education,
      sal_values = salVals,
      currencies = currencies,
      work_hours = workHours,
      orgs = turns.flatMap(_.orgs).distinct,
      tools = turns.flatMap(t => Option(t.tool)).distinct,
      start_dates = turns.flatMap(_.start_dates).distinct,
      deadline_dates = turns.flatMap(_.deadline_dates).distinct)
  }

  // ------------------------------------------------------------------
  // Two-level (salted) aggregation
  // ------------------------------------------------------------------

  /** Phase-1 partial: the merge-associative slice of one contiguous
    * turn-range bucket. `sal_broke` carries the salary short-circuit
    * state across buckets; ordered-distinct seqs merge by filtered concat.
    * `bucket` is the merge sort key (salted path: turn_idx / bucketSize;
    * clustered path: the chunk's first turn_idx); `idx_lo`/`idx_hi` are the
    * covered turn_idx range, used by [[mergePartials]] to reject partials
    * whose ranges overlap (which can only happen when a caller violated the
    * contiguous-contiguous-range contract, e.g. a duplicated input).
    */
  final case class ConvPartial(
      conv_id: String, bucket: Int,
      emp_groups: Seq[String], locations: Seq[String], edu_phrases: Seq[String],
      sal_values: Seq[Double], sal_broke: Boolean, currencies: Seq[String],
      text: String, orgs: Seq[String], tools: Seq[String],
      start_dates: Seq[String], deadline_dates: Seq[String],
      idx_lo: Int, idx_hi: Int)

  def partialOf(convId: String, bucket: Int, turnsUnsorted: Seq[SlimTurn]): ConvPartial = {
    val turns = turnsUnsorted.sortBy(_.turn_idx)
    val emp = scala.collection.mutable.LinkedHashSet.empty[String]
    turns.foreach(_.emp_groups.foreach(emp += _))
    val edu = scala.collection.mutable.LinkedHashSet.empty[String]
    turns.foreach(_.edu_phrases.foreach(edu += _))
    var salVals = Seq.empty[Double]
    var broke = false
    turns.foreach { t =>
      t.sal.foreach { s =>
        if (!broke && (s.values.nonEmpty || s.cur_assoc.nonEmpty)) {
          if (s.cur_assoc.nonEmpty) { salVals = s.cur_assoc; broke = true }
          else if (s.sw_kw)
            salVals = salVals ++ s.values.distinct.filterNot(salVals.contains)
        }
      }
    }
    ConvPartial(
      conv_id = convId,
      bucket = bucket,
      emp_groups = emp.toSeq,
      locations = turns.flatMap(_.locations),
      edu_phrases = edu.toSeq,
      sal_values = salVals,
      sal_broke = broke,
      currencies = turns.flatMap(_.sal.map(_.currencies).getOrElse(Seq.empty)).distinct,
      text = turns.map(_.text).mkString(". "),
      orgs = turns.flatMap(_.orgs).distinct,
      tools = turns.flatMap(t => Option(t.tool)).distinct,
      start_dates = turns.flatMap(_.start_dates).distinct,
      deadline_dates = turns.flatMap(_.deadline_dates).distinct,
      idx_lo = turns.head.turn_idx,
      idx_hi = turns.last.turn_idx)
  }

  private def orderedDedupConcat(seqs: Seq[Seq[String]]): Seq[String] = {
    val acc = scala.collection.mutable.LinkedHashSet.empty[String]
    seqs.foreach(_.foreach(acc += _))
    acc.toSeq
  }

  /** Phase-2 merge of the ordered bucket partials + the whole-document
    * branch (which inherently needs the full conv text).
    */
  def mergePartials(convId: String, partsUnsorted: Seq[ConvPartial]): ConvExtract = {
    val parts = partsUnsorted.sortBy(p => (p.bucket, p.idx_lo))
    // contiguous-range invariant: every merge strategy (salted buckets,
    // clustered chunks, cross-partition boundary partials) produces
    // disjoint turn_idx ranges; a proper overlap means the same turns
    // reached two partials (duplicated/interleaved input) and merging
    // would silently misorder the conversation text — fail instead
    // ranges are INCLUSIVE, so a shared endpoint ([0,5] then [5,9], or two
    // zero-width [0,0] partials from a duplicated single-turn conversation)
    // is already the same turn reaching two partials — hence <=, not <
    parts.iterator.sliding(2).withPartial(false).foreach { w =>
      if (w(1).idx_lo <= w.head.idx_hi)
        throw new ConvContractViolation(
          s"ConvFinalize.mergePartials: overlapping turn ranges for conv_id=$convId " +
            s"([${w.head.idx_lo},${w.head.idx_hi}] vs [${w(1).idx_lo},${w(1).idx_hi}]) - " +
            "the input violated the clustered/salted partitioning contract")
    }

    val empGroups = orderedDedupConcat(parts.map(_.emp_groups))
    val employment = Rules.priorityEmployment(empGroups)
    val location = Rules.modeLocation(parts.flatMap(_.locations))
    val education = Rules.priorityDegree(orderedDedupConcat(parts.map(_.edu_phrases)))

    var salVals = Seq.empty[Double]
    var broke = false
    parts.foreach { p =>
      if (!broke) {
        if (p.sal_broke) { salVals = p.sal_values; broke = true }
        else salVals = salVals ++ p.sal_values.filterNot(salVals.contains)
      }
    }
    val currencies = parts.flatMap(_.currencies).distinct

    val convText = parts.map(_.text).mkString(". ")
    val docClean = Rules.cleanString(convText)
    val spans = Rules.extractWorkHourSpans(docClean)
    val workHours =
      if (spans.isEmpty) None
      else Some(Rules.maxWorkHours(Rules.cleanedWorkHours(spans)))

    val pre = DictRules.preprocess(convText).toLowerCase
    val title = DictRules.extractTitle(pre)
    val skills = DictRules.filterSkillsByTitle(title, DictRules.extractSkills(pre))

    ConvExtract(
      conv_id = convId,
      title = title,
      skills = skills,
      employment = employment,
      location = location,
      education = education,
      sal_values = salVals,
      currencies = currencies,
      work_hours = workHours,
      orgs = parts.flatMap(_.orgs).distinct,
      tools = parts.flatMap(_.tools).distinct,
      start_dates = parts.flatMap(_.start_dates).distinct,
      deadline_dates = parts.flatMap(_.deadline_dates).distinct)
  }

  private def slim(extracted: org.apache.spark.sql.DataFrame)(
      implicit spark: SparkSession): Dataset[SlimTurn] = {
    import spark.implicits._
    extracted
      .select("conv_id", "turn_idx", "tool", "text", "emp_groups", "locations",
        "orgs", "edu_phrases", "sal", "start_dates", "deadline_dates")
      .as[SlimTurn]
  }

  /** Production path: salted two-phase aggregation — no per-conversation
    * Seq ever exceeds `bucketSize` turns (phase 1) or `maxTurns/bucketSize`
    * partials (phase 2).
    */
  def run(extracted: org.apache.spark.sql.DataFrame, bucketSize: Int = 256)(
      implicit spark: SparkSession): Dataset[ConvExtract] = {
    import spark.implicits._
    slim(extracted)
      .groupByKey(t => (t.conv_id, t.turn_idx / bucketSize))
      .mapGroups((key, it) => partialOf(key._1, key._2, it.toSeq))
      .groupByKey(_.conv_id)
      .mapGroups((cid, it) => mergePartials(cid, it.toSeq))
  }

  /** Single-phase fold — the differential oracle for the salted path. */
  def runSinglePhase(extracted: org.apache.spark.sql.DataFrame)(
      implicit spark: SparkSession): Dataset[ConvExtract] = {
    import spark.implicits._
    slim(extracted)
      .groupByKey(_.conv_id)
      .mapGroups((cid, it) => finalizeConv(cid, it.toSeq))
  }

  // ------------------------------------------------------------------
  // Clustered-input fast path
  // ------------------------------------------------------------------

  /** One-pass scan output: exactly one side set — a fully resolved interior
    * conversation, or a boundary partial for the cross-partition merge.
    */
  final case class ClusteredOut(done: Option[ConvExtract], part: Option[ConvPartial])

  /** Streaming per-partition scan for [[runClustered]]: folds each
    * contiguous run of one conv_id into ordered [[ConvPartial]] chunks
    * (bucket = chunk's first turn_idx, so cross-partition partials sort
    * correctly), resolves interior runs on the spot, and emits the first
    * and last run of the partition as partials (they may continue in a
    * neighboring partition). Memory: at most one `bucketSize` chunk of RAW
    * turns at a time, plus the current run's accumulated partials — whose
    * conv-level payload (concatenated text + mention arrays) does grow
    * with the conversation, the same per-conversation footprint as the
    * salted path's phase-2 merge; `seen` additionally holds one conv_id
    * string per conversation for the partition's lifetime. What is saved
    * vs. the salted path is the shuffle, not the merge-side footprint.
    *
    * Contract violations do not corrupt: a conv_id recurring after its run
    * closed, or a turn_idx going backwards inside a run, throws here;
    * cross-partition duplication is caught by [[runClustered]]'s merge
    * group (overlap guard in [[mergePartials]] / duplicate-resolution
    * guard), so the only silent behavior is the correct one.
    */
  private[operators] def clusteredScan(
      rows: Iterator[SlimTurn], bucketSize: Int): Iterator[ClusteredOut] =
    new scala.collection.AbstractIterator[ClusteredOut] {
      private val out = scala.collection.mutable.Queue.empty[ClusteredOut]
      private val seen = new java.util.HashSet[String]()
      private var firstRun = true
      private var pending: SlimTurn = if (rows.hasNext) rows.next() else null

      private def consumeRun(): Unit = {
        val convId = pending.conv_id
        if (!seen.add(convId))
          throw new ConvContractViolation(
            s"ConvFinalize.runClustered: conv_id=$convId appears in non-contiguous runs " +
              "within one partition - the input is not clustered by conv_id; " +
              "use ConvFinalize.run (salted path) for unclustered inputs")
        val partials = scala.collection.mutable.ArrayBuffer.empty[ConvPartial]
        val chunk = scala.collection.mutable.ArrayBuffer.empty[SlimTurn]
        var lastIdx = Int.MinValue
        var runOpen = true
        while (runOpen) {
          val t = pending
          if (t.turn_idx <= lastIdx) // == is a duplicated turn: (conv_id, turn_idx) is unique
            throw new ConvContractViolation(
              s"ConvFinalize.runClustered: turn_idx ${t.turn_idx} after $lastIdx inside " +
                s"conv_id=$convId - the input is not sorted by unique (conv_id, turn_idx); " +
                "use ConvFinalize.run (salted path) for unsorted inputs")
          lastIdx = t.turn_idx
          chunk += t
          if (chunk.length >= bucketSize) {
            partials += partialOf(convId, chunk.head.turn_idx, chunk.toSeq)
            chunk.clear()
          }
          if (rows.hasNext) {
            pending = rows.next()
            if (pending.conv_id != convId) runOpen = false
          } else { pending = null; runOpen = false }
        }
        if (chunk.nonEmpty) partials += partialOf(convId, chunk.head.turn_idx, chunk.toSeq)
        val lastRun = pending == null
        if (firstRun || lastRun) partials.foreach(p => out += ClusteredOut(None, Some(p)))
        else out += ClusteredOut(Some(mergePartials(convId, partials.toSeq)), None)
        firstRun = false
      }

      override def hasNext: Boolean = {
        while (out.isEmpty && pending != null) consumeRun()
        out.nonEmpty
      }
      override def next(): ClusteredOut = {
        if (!hasNext) throw new NoSuchElementException("clusteredScan")
        out.dequeue()
      }
    }

  /** Fast path for inputs clustered by conv_id and sorted by turn_idx
    * within each conversation — the natural layout of a transcript table
    * (an Iceberg table written with SORTED BY (conv_id, turn_idx), the
    * stage checkpoints, the generator). Interior conversations resolve
    * entirely map-side, so the per-turn payload (text + mention arrays)
    * never crosses a shuffle: the only exchanged rows are conversation-level
    * results plus the few partials of conversations straddling a partition
    * boundary (≤ 2 per partition) — at fact scale that turns the pipeline's
    * one turn-volume shuffle into a conversation-volume one.
    *
    * Safety: the contract is checked, not trusted. In-partition
    * interleaving or disorder throws in [[clusteredScan]]; a conversation
    * duplicated across partitions either merges overlapping ranges
    * (rejected by [[mergePartials]]) or resolves twice (rejected by the
    * single-resolution guard below). No violation can silently corrupt a
    * result — callers with arbitrary inputs use [[run]].
    */
  def runClustered(extracted: org.apache.spark.sql.DataFrame, bucketSize: Int = 256)(
      implicit spark: SparkSession): Dataset[ConvExtract] = {
    import spark.implicits._
    slim(extracted)
      .mapPartitions(it => clusteredScan(it, bucketSize))
      .groupByKey(r => r.done.map(_.conv_id).getOrElse(r.part.get.conv_id))
      .mapGroups { (cid, it) =>
        val rs = it.toSeq
        val dones = rs.flatMap(_.done)
        val parts = rs.flatMap(_.part)
        if (dones.length == 1 && parts.isEmpty) dones.head
        else if (dones.isEmpty && parts.nonEmpty) mergePartials(cid, parts)
        else
          throw new ConvContractViolation(
            s"ConvFinalize.runClustered: conv_id=$cid resolved ${dones.length} times with " +
              s"${parts.length} loose partials - the input duplicated a conversation across " +
              "partitions; use ConvFinalize.run (salted path) for such inputs")
      }
  }
}

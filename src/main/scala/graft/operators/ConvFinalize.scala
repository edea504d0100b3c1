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
    */
  final case class ConvPartial(
      conv_id: String, bucket: Int,
      emp_groups: Seq[String], locations: Seq[String], edu_phrases: Seq[String],
      sal_values: Seq[Double], sal_broke: Boolean, currencies: Seq[String],
      text: String, orgs: Seq[String], tools: Seq[String],
      start_dates: Seq[String], deadline_dates: Seq[String])

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
      deadline_dates = turns.flatMap(_.deadline_dates).distinct)
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
    val parts = partsUnsorted.sortBy(_.bucket)

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
}

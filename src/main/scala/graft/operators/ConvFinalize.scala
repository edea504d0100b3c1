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
    tools: Seq[String])

/** S5 — the single fact-scale shuffle of the pipeline: group turns by
  * conv_id and resolve per-conv facts (A1-A5 merges + the whole-document
  * dictionary branch X11-X14). Order-sensitivity is pinned by sorting on
  * turn_idx inside the group (collect order post-shuffle is otherwise
  * nondeterministic — SURVEY §7.4).
  *
  * Skew: AQE rebalances the preceding exchange; monster conversations are
  * bounded by the generator's turn cap. If a real corpus had 10^6-turn
  * conversations the escape hatch is a two-level aggregation (partial
  * per-(conv, bucket) merge first) — documented, not needed at fixture
  * scale.
  */
object ConvFinalize {

  /** Shuffle payload: only what conv-level resolution needs (the cleaned
    * text, role and category columns stay behind — ~45% fewer shuffle
    * bytes at fact scale).
    */
  final case class SlimTurn(
      conv_id: String, turn_idx: Int, tool: String, text: String,
      emp_groups: Seq[String], locations: Seq[String], orgs: Seq[String],
      edu_phrases: Seq[String], sal: Option[SalStruct])

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
      tools = turns.flatMap(t => Option(t.tool)).distinct)
  }

  def run(extracted: org.apache.spark.sql.DataFrame)(implicit spark: SparkSession): Dataset[ConvExtract] = {
    import spark.implicits._
    extracted
      .select("conv_id", "turn_idx", "tool", "text", "emp_groups", "locations",
        "orgs", "edu_phrases", "sal")
      .as[SlimTurn]
      .groupByKey(_.conv_id)
      .mapGroups((cid, it) => finalizeConv(cid, it.toSeq))
  }
}

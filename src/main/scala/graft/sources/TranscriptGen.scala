package graft.sources

import java.sql.Timestamp
import java.util.Random

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Turn

/** Deterministic synthetic transcript generator (FIXTURES.md §1).
  *
  * Replaces the reference's scraped postings (SURVEY §2.1 S8 is out of
  * scope): each conversation plants extractable facts — title, org, skills,
  * location, salary, hours, employment type, education — using templates
  * that mirror the surface patterns the reference extracts from
  * (/root/reference/extract-info/ExtractInfo.py §2.6). Generation is a pure
  * function of (seed, convIdx), so it runs distributed via
  * `spark.range(n).flatMap` with no driver loop and no shuffle, and golden
  * triples are derivable per conv without running the pipeline.
  *
  * Skew knob: the first `skewConvs` conversations get ~`skewTurns` filler
  * turns to exercise salted grouping / AQE skew handling.
  */
object TranscriptGen {

  val BaseEpochMs: Long = 1767225600000L // 2026-01-01T00:00:00Z, fixed

  final case class ConvFacts(
      convId: String,
      occupation: Dims.Occupation,
      titleSurface: String,
      plantedSkillSurfaces: Seq[String],
      orgBase: String,
      orgSurface: String,
      country: String,
      city: String,
      salaryVariant: Int,
      salaryAmount: Long,
      hoursVariant: Int,
      hoursAmount: Int,
      empSurfaces: Seq[String],
      degreePhrases: Seq[String],
      tools: Seq[String],
      hasSalary: Boolean,
      hasHours: Boolean,
      hasEmployment: Boolean,
      hasEducation: Boolean,
      fillerCount: Int,
      hasStartDate: Boolean,
      hasDeadline: Boolean,
      startDateText: String,
      deadlineText: String)

  def rngFor(seed: Long, i: Long): Random = new Random(seed ^ (i * 0x9E3779B97F4A7C15L))

  def factsFor(i: Long, seed: Long, skewConvs: Int, skewTurns: Int): ConvFacts = {
    val r = rngFor(seed, i)
    val occ = Dims.occupations(r.nextInt(Dims.occupations.length))
    val titleSurface = {
      val all = occ.name +: occ.alts
      all(r.nextInt(all.length))
    }
    // plant 2-3 essential + 0-1 optional skill surfaces (preferred labels or alts)
    val ess = r.nextInt(2) + 2
    val planted = scala.collection.mutable.LinkedHashSet.empty[String]
    occ.essential.take(ess).foreach { label =>
      val sk = Dims.skills.find(_.label == label).get
      val surfaces = sk.label +: sk.alts
      planted += surfaces(r.nextInt(surfaces.length))
    }
    if (r.nextInt(2) == 0 && occ.optional.nonEmpty) {
      val label = occ.optional(r.nextInt(occ.optional.length))
      Dims.skills.find(_.label == label).foreach { sk =>
        planted += (sk.label +: sk.alts)(r.nextInt(1 + sk.alts.length))
      }
    }
    val orgBase = Dims.orgs(r.nextInt(Dims.orgs.length))
    // suffix "" dominates so the base surface is each cluster's mode
    val suffix = if (r.nextInt(10) < 6) "" else Dims.orgSuffixes(1 + r.nextInt(3))
    val country = Dims.countries(r.nextInt(Dims.countries.length))
    val city = country.cities(r.nextInt(country.cities.length))
    val salaryVariant = r.nextInt(5)
    val salaryAmount = salaryVariant match {
      case 1 | 4 => 1500L + r.nextInt(65) * 100L // monthly 1500..7900
      case _ => 20000L + r.nextInt(70) * 1000L // yearly 20k..89k
    }
    val hoursVariant = r.nextInt(5)
    val hoursAmount = Seq(35, 38, 40, 42)(r.nextInt(4))
    val empGroups = Dims.employmentGroups
    val g1 = empGroups(r.nextInt(empGroups.length))
    val emp1 = g1._2(r.nextInt(g1._2.length))
    val empSurfaces =
      if (r.nextInt(10) < 3) {
        val g2 = empGroups((empGroups.indexOf(g1) + 1 + r.nextInt(empGroups.length - 1)) % empGroups.length)
        Seq(emp1, g2._2(r.nextInt(g2._2.length)))
      } else Seq(emp1)
    val lvl = Dims.degreePriority(r.nextInt(Dims.degreePriority.length))
    val deg1 = Dims.degreePhrases(lvl)(r.nextInt(Dims.degreePhrases(lvl).length))
    val degs =
      if (r.nextInt(10) < 3) {
        val lvl2 = Dims.degreePriority(r.nextInt(Dims.degreePriority.length))
        Seq(deg1, Dims.degreePhrases(lvl2)(r.nextInt(Dims.degreePhrases(lvl2).length))).distinct
      } else Seq(deg1)
    val tools = (0 until r.nextInt(3)).map(_ => Dims.toolNames(r.nextInt(Dims.toolNames.length))).distinct
    val filler = if (i < skewConvs) skewTurns + r.nextInt(skewTurns / 2 + 1) else r.nextInt(6)
    val hasSalary = r.nextInt(10) < 9
    val hasHours = r.nextInt(10) < 9
    val hasEmployment = r.nextInt(10) < 9
    val hasEducation = r.nextInt(10) < 9
    // X5 fixtures (drawn LAST so every pre-existing fact keeps its value
    // for a given (seed, i)): a start date in "d month yyyy" form and a
    // deadline in either month-name or dd.mm.yyyy form
    val hasStartDate = r.nextInt(10) < 7
    val hasDeadline = r.nextInt(10) < 7
    val startDay = 1 + r.nextInt(28)
    val startMonth = Dims.monthNames(r.nextInt(Dims.monthNames.length))
    val startYear = 2026 + r.nextInt(2)
    val dlDay = 1 + r.nextInt(28)
    val dlMonthIdx = r.nextInt(Dims.monthNames.length)
    val dlYear = 2026 + r.nextInt(2)
    val deadlineText =
      if (r.nextInt(2) == 0) s"$dlDay ${Dims.monthNames(dlMonthIdx)} $dlYear"
      // monthNames carries 12 full + 12 abbreviated names; the numeric
      // form must fold the abbreviated half back to calendar months 1-12
      // (dlMonthIdx + 1 produced impossible months 13-24 for half the
      // draws — fixed without consuming extra RNG draws, so every other
      // generated fact keeps its value for a given (seed, i))
      else f"$dlDay%d.${dlMonthIdx % 12 + 1}%02d.$dlYear%d"
    ConvFacts(
      convId = f"conv-$i%08d",
      occupation = occ,
      titleSurface = titleSurface,
      plantedSkillSurfaces = planted.toSeq,
      orgBase = orgBase,
      orgSurface = orgBase + suffix,
      country = country.name,
      city = city.split(' ').map(_.capitalize).mkString(" ").capitalize,
      salaryVariant = salaryVariant,
      salaryAmount = salaryAmount,
      hoursVariant = hoursVariant,
      hoursAmount = hoursAmount,
      empSurfaces = empSurfaces,
      degreePhrases = degs,
      tools = tools,
      hasSalary = hasSalary,
      hasHours = hasHours,
      hasEmployment = hasEmployment,
      hasEducation = hasEducation,
      fillerCount = filler,
      hasStartDate = hasStartDate,
      hasDeadline = hasDeadline,
      startDateText = s"$startDay $startMonth $startYear",
      deadlineText = deadlineText)
  }

  /** Neutral fillers — verified to trip no extraction gate (no currency,
    * salary/hours keywords, employment surfaces, dictionary surfaces,
    * gazetteer names, numbers ≥ 450, or adjacent capitalized word pairs).
    */
  val fillers: IndexedSeq[String] = IndexedSeq(
    "Thanks, that sounds interesting to me.",
    "Could you tell me more about the team?",
    "Our team values collaboration and curiosity.",
    "I appreciate the quick response.",
    "Let me check with my colleagues first.",
    "That makes sense, thank you.",
    "The interview process has three stages.",
    "Please send your resume as a single document.",
    "We look forward to hearing from you.",
    "Applications are reviewed on a rolling basis.",
    "Is there anything else you would like to know?",
    "I will follow up with the details soon.")

  def salaryText(f: ConvFacts): String = f.salaryVariant match {
    case 0 => s"The yearly salary is ${f.salaryAmount} € per year."
    case 1 => s"We offer a monthly salary of ${f.salaryAmount} euro gross."
    case 2 => s"Salary range: ${f.salaryAmount}-${f.salaryAmount + 10000} euro per year."
    case 3 => s"The annual salary is ${f.salaryAmount} dollars in total."
    case _ => s"Monthly payment: € ${f.salaryAmount} gross."
  }

  def hoursText(f: ConvFacts): String = f.hoursVariant match {
    case 0 => s"Working time is ${f.hoursAmount} hours per week."
    case 1 => "Office hours are 9am - 5pm on weekdays."
    case 2 => "You can expect regular working hours at our office."
    case 3 => s"The role requires ${f.hoursAmount - 15}-${f.hoursAmount} hours per week."
    case _ => "The schedule is forty hours each week." // F12 word-to-number path
  }

  /** (role, text, tool, category) — category is the generator-known section
    * label used to train/eval the tagger (FIXTURES.md §2 vocabulary).
    */
  def scriptedTurns(f: ConvFacts): Seq[(String, String, String, String)] = {
    val b = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String)]
    b += (("user", "Hello, I am looking for a new role.", null, "description"))
    b += (("assistant", s"We are hiring a ${f.titleSurface} at ${f.orgSurface}.", null, "hiring_organization"))
    b += (("assistant", s"Required skills: ${f.plantedSkillSurfaces.mkString(", ")}.", null, "skills"))
    b += (("assistant", s"The position is located in ${f.city}, ${f.country}.", null, "job_location"))
    if (f.hasSalary) b += (("assistant", salaryText(f), null, "base_salary"))
    if (f.hasHours) b += (("assistant", hoursText(f), null, "work_hours"))
    if (f.hasEmployment) {
      val t = if (f.empSurfaces.length > 1)
        s"This is a ${f.empSurfaces.head} role, with ${f.empSurfaces(1)} options."
      else s"This is a ${f.empSurfaces.head} role."
      b += (("assistant", t, null, "employment_type"))
    }
    if (f.hasEducation) {
      val t = if (f.degreePhrases.length > 1)
        s"Candidates should hold a ${f.degreePhrases.head} or a ${f.degreePhrases(1)}."
      else s"Candidates should hold a ${f.degreePhrases.head}."
      b += (("assistant", t, null, "education_requirements"))
    }
    // X5 fixtures: planted start/deadline dates (extraction is flag-gated;
    // these sentences are extraction-neutral for every other rule family —
    // no currency/salary/hours keywords, no gazetteer or dictionary
    // surfaces, no adjacent-capitalized ORG shapes)
    if (f.hasStartDate)
      b += (("assistant", s"The position starts on ${f.startDateText}.", null, "start_date"))
    if (f.hasDeadline)
      b += (("assistant", s"Please apply before ${f.deadlineText}.", null, "deadline_date"))
    f.tools.zipWithIndex.foreach { case (t, k) =>
      b += (("tool", s"tool $t returned ${k + 2} results.", t, "description"))
    }
    b.toSeq
  }

  /** Turns plus the generator-known section label (training data for the
    * section tagger, SURVEY §2.5 ground-truth analogue).
    */
  def labeledTurnsFor(i: Long, seed: Long, skewConvs: Int = 0, skewTurns: Int = 0): Seq[(Turn, String)] = {
    val f = factsFor(i, seed, skewConvs, skewTurns)
    val r = rngFor(seed, i + (1L << 40)) // independent stream for interleaving
    val scripted = scriptedTurns(f)
    val withFiller = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String)]
    scripted.foreach { t =>
      withFiller += t
      if (r.nextInt(3) == 0)
        withFiller += (("user", fillers(r.nextInt(fillers.length)), null, "description"))
    }
    (0 until f.fillerCount).foreach { _ =>
      withFiller += (("user", fillers(r.nextInt(fillers.length)), null, "description"))
    }
    withFiller.zipWithIndex.map { case ((role, text, tool, cat), idx) =>
      (Turn(f.convId, idx, role, text, tool,
        new Timestamp(BaseEpochMs + i * 3600000L + idx * 10000L)), cat)
    }.toSeq
  }

  def turnsFor(i: Long, seed: Long, skewConvs: Int, skewTurns: Int): Seq[Turn] =
    labeledTurnsFor(i, seed, skewConvs, skewTurns).map(_._1)

  /** Distributed generation: no driver loop, no shuffle; partitions scale
    * with the range parallelism.
    */
  def dataset(spark: SparkSession, nConvs: Long, seed: Long = 42L,
      skewConvs: Int = 2, skewTurns: Int = 800): Dataset[Turn] = {
    import spark.implicits._
    spark.range(nConvs).flatMap(i => turnsFor(i, seed, skewConvs, skewTurns))
  }
}

package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.rules.Rules
import graft.sources.Dims

/** Per-turn extracted row: still one row per turn, extraction results as
  * array columns. Narrow (no shuffle) — everything here happens inside one
  * whole-stage-codegen'd projection plus a gated typed map.
  */
final case class TurnExtracted(
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    text: String,
    text_clean: String,
    category: String,
    emp_groups: Seq[String],
    locations: Seq[String],
    orgs: Seq[String],
    edu_phrases: Seq[String],
    sal_values: Seq[Double],
    sal_currencies: Seq[String],
    sal_cur_assoc: Seq[Double],
    sal_sw_keyword: Boolean)

/** S3 mention detection — rule extractors X1-X10 as Column expressions
  * where builtins express them, with the two intricate row-local parsers
  * (salary X6, education X10) as typed maps behind cheap Column gates so
  * only gated rows pay the Scala cost (SURVEY §2.11).
  */
object TurnExtract {

  /** X9 — employment surfaces by substring containment, mapped to group
    * names, first-hit order preserved (ExtractInfo.py:562-597).
    */
  def employmentGroupsCol(clean: Column): Column = {
    val surfaceToGroup =
      typedlit(Dims.employmentGroups.flatMap { case (g, ss) => ss.map(_ -> g) }.toMap)
    array_distinct(
      transform(
        filter(typedlit(Dims.employmentKeywords), k => clean.contains(k)),
        k => element_at(surfaceToGroup, k)))
  }

  private lazy val gazPattern: String =
    "\\b(" + Dims.gazetteer.keys.toSeq.sortBy(s => (-s.length, s))
      .map(Pattern.quote).mkString("|") + ")\\b"

  /** X3 — location gazetteer scan (countries + cities), mapped to country
    * display names, match-order distinct.
    */
  def locationsCol(clean: Column): Column =
    array_distinct(
      transform(
        regexp_extract_all(clean, lit(gazPattern), lit(1)),
        s => element_at(typedlit(Dims.gazetteer), s)))

  private val orgPattern = "\\b([A-Z][a-z]+(?: [A-Z][a-zA-Z]+)+)\\b"

  /** X4 — ORG mentions on RAW text (capitalization carries the signal),
    * with the reference's URL/length filters and a country blocklist.
    */
  def orgsCol(raw: Column): Column = {
    val countryLit = typedlit(Dims.countries.map(_.name))
    array_distinct(
      filter(
        regexp_extract_all(raw, lit(orgPattern), lit(1)),
        o => !lower(o).contains("http") && !lower(o).contains("www") &&
          length(o) >= 3 && !array_contains(countryLit, o)))
  }

  /** X1/X2 salary gate as a cheap Column so the typed parser only runs on
    * gated rows (ExtractInfo.py:425-430).
    */
  def salaryGateCol(clean: Column): Column = {
    val combos = Dims.salaryCombinations
      .map { case (a, b) => clean.contains(a) && clean.contains(b) }
      .reduce(_ || _)
    val kw = arrays_overlap(split(clean, "\\s+"), typedlit(Dims.salaryCommonKeywords))
    val curWord = arrays_overlap(split(clean, "\\s+"), typedlit(Dims.currencyWords.keys.toSeq))
    val curSym = clean.contains("€") || clean.contains("$") || clean.contains("£")
    combos || kw || curWord || curSym
  }

  final case class Gated(
      conv_id: String, turn_idx: Int, role: String, tool: String,
      text: String, text_clean: String, category: String,
      emp_groups: Seq[String], locations: Seq[String], orgs: Seq[String],
      sal_gate: Boolean, edu_gate: Boolean)

  /** turns(+category) -> TurnExtracted. Input must carry
    * conv_id, turn_idx, role, tool, text, text_clean, category.
    */
  def extract(turns: DataFrame)(implicit spark: SparkSession): Dataset[TurnExtracted] = {
    import spark.implicits._
    val cl = col("text_clean")
    turns
      .withColumn("emp_groups", employmentGroupsCol(cl))
      .withColumn("locations", locationsCol(cl))
      .withColumn("orgs", orgsCol(col("text")))
      .withColumn("sal_gate", salaryGateCol(cl))
      .withColumn("edu_gate", col("category") === "education_requirements")
      .select("conv_id", "turn_idx", "role", "tool", "text", "text_clean", "category",
        "emp_groups", "locations", "orgs", "sal_gate", "edu_gate")
      .as[Gated]
      .map { g =>
        val edu = if (g.edu_gate) Rules.extractEducation(g.text_clean) else Seq.empty[String]
        val sal = if (g.sal_gate) Rules.extractSalary(g.text_clean) else None
        TurnExtracted(
          g.conv_id, g.turn_idx, g.role, g.tool, g.text, g.text_clean, g.category,
          g.emp_groups, g.locations, g.orgs, edu,
          sal.map(_.values).getOrElse(Seq.empty),
          sal.map(_.currencies).getOrElse(Seq.empty),
          sal.map(_.currencyAssociated).getOrElse(Seq.empty),
          sal.exists(_.surrounding.split("[\\s,]+").exists(Dims.salaryCommonKeywords.contains)))
      }
  }
}

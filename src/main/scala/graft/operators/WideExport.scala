package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wide-row export — the reference's final spine join + MySQL/TSV sink
  * (SURVEY §2.8 J2, §2.1 S5/S6): triples pivot back to one row per subject
  * with the reference's cell conventions — skills joined '; '
  * (extractor.py:87-90), other multi-values ','-joined, plus the F14 export
  * cleanup (bracket/quote strip, 'full time'→'full-time',
  * MergeAndExportInfo.py:44-64). Values are sorted per cell for
  * determinism (the reference's extraction order is replaced by a stable
  * order — recorded divergence).
  */
object WideExport {

  val preds: Seq[String] = Seq("job_title", "skill", "sector", "estimated_salary",
    "education_requirements", "employment_type", "job_location", "work_hours",
    "base_salary", "salary_currency", "hiring_organization", "uses_tool",
    "start_date", "deadline_date") // X5 preds (empty when the flag is off)

  /** F14 `cl`: strip brackets/quotes, canonical 'full-time'. */
  def cleanCell(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(c, "[\\[\\]'\"]", ""), "full time", "full-time")

  def widen(triples: DataFrame): DataFrame = {
    // join each cell with its own separator up front — a post-hoc
    // ","→"; " rewrite would corrupt obj values that contain commas
    // (e.g. "Acme, Inc" survives cleanCell)
    triples
      .groupBy("subj", "pred")
      .agg(sort_array(collect_list(col("obj"))).as("objs_arr"))
      .withColumn("objs",
        when(col("pred") === "skill", array_join(col("objs_arr"), "; "))
          .otherwise(array_join(col("objs_arr"), ",")))
      .groupBy("subj")
      .pivot("pred", preds)
      .agg(first(cleanCell(col("objs"))))
  }

  /** S5 TSV sink (ProcessAndMergeInfo.py:573 writes TSV; MergeAndExportInfo
    * reads it back typed).
    */
  def exportTsv(wide: DataFrame, path: String): Unit =
    wide.write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .csv(path)
}

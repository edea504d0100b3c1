package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Constraint validation over the materialized triple table — the
  * SHACL-lite quality gate of a KG pipeline: violations are emitted as
  * rows (auditable, joinable back to provenance), never thrown, because
  * at 10^12 triples SOME violations are a statistical certainty and the
  * pipeline's job is to quarantine them, not die.
  *
  * Both checks are single-purpose and shuffle-minimal: the functional
  * check is one partial-aggregated groupBy on (subj, pred) over only the
  * constrained predicates (filter pushed to the scan); the range check is
  * one anti-join against the allowed-value dim, which AQE broadcasts at
  * dim size. No fact×fact joins.
  */
object Constraints {

  /** Functional-predicate violations: subjects carrying MORE THAN ONE
    * distinct object for a predicate declared single-valued (a
    * conversation with two hiring organizations, a document with two
    * languages). Exact duplicate triples are NOT violations — the triple
    * store is a set — and null objects don't count toward the fan-out
    * (countDistinct skips them). Output: (subj, pred, n_values).
    */
  def functionalViolations(triples: DataFrame, preds: Seq[String]): DataFrame = {
    require(preds.nonEmpty, "declare at least one functional predicate")
    triples.filter(col("pred").isInCollection(preds))
      .groupBy("subj", "pred")
      .agg(countDistinct(col("obj")).as("n_values"))
      .filter(col("n_values") > 1)
  }

  /** Range violations: triples of `pred` whose object is not in the
    * allowed-value dimension (first column of `allowed`). Null objects
    * are violations — a range-constrained predicate promising a value
    * from the dim and delivering none is exactly what this catches.
    * Output: (subj, pred, obj).
    */
  def rangeViolations(triples: DataFrame, pred: String,
      allowed: DataFrame): DataFrame = {
    val dim = allowed.select(allowed.columns.head).toDF("obj")
      .where(col("obj").isNotNull).distinct()
    triples.filter(col("pred") === pred)
      .join(dim, Seq("obj"), "left_anti")
      .select("subj", "pred", "obj")
  }
}

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

  /** Cardinality violations (sh:minCount / sh:maxCount): for every
    * subject IN SCOPE, the predicates whose distinct-object count falls
    * outside [minCount, maxCount]. The scope frame (one column of
    * subject ids — "every conversation", "every document") is what makes
    * minCount checkable at all: a subject with ZERO triples of the
    * predicate never appears in the triple table, so the count comes
    * from a scope × constraint grid LEFT-joined to the observed counts.
    * Grid size = |scope| × |constraints| (constraints are a handful),
    * observed counts are one partial-aggregated groupBy. Output:
    * (subj, pred, n_values, violation ∈ 'min' | 'max').
    */
  def cardinalityViolations(triples: DataFrame, scope: DataFrame,
      constraints: Seq[(String, Int, Int)]): DataFrame = {
    require(constraints.nonEmpty, "declare at least one cardinality shape")
    constraints.foreach { case (p, lo, hi) =>
      require(lo >= 0 && hi >= lo, s"bad cardinality [$lo, $hi] for $p") }
    val spark = triples.sparkSession
    import scala.jdk.CollectionConverters._
    val shapes = spark.createDataFrame(
      constraints.map { case (p, lo, hi) =>
        org.apache.spark.sql.Row(p, lo.toLong, hi.toLong) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pred",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("min_c",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("max_c",
          org.apache.spark.sql.types.LongType))))
    val counts = triples
      .filter(col("pred").isInCollection(constraints.map(_._1)))
      .groupBy("subj", "pred")
      .agg(countDistinct(col("obj")).as("n_values"))
    scope.select(scope.columns.head).toDF("subj")
      .where(col("subj").isNotNull).distinct()
      .crossJoin(broadcast(shapes))
      .join(counts, Seq("subj", "pred"), "left")
      .withColumn("n_values", coalesce(col("n_values"), lit(0L)))
      .where(col("n_values") < col("min_c") || col("n_values") > col("max_c"))
      .select(col("subj"), col("pred"), col("n_values"),
        when(col("n_values") < col("min_c"), lit("min"))
          .otherwise(lit("max")).as("violation"))
  }

  /** Datatype violations (sh:datatype on a literal-valued predicate):
    * triples of `pred` whose object does not parse as the declared type
    * — 'integer' (optional sign, digits only) or 'double' (any numeric).
    * Nulls are violations, as in [[rangeViolations]]. The parse checks
    * are pure Column casts (codegen'd, no regex). Output:
    * (subj, pred, obj).
    */
  def datatypeViolations(triples: DataFrame, pred: String,
      datatype: String): DataFrame = {
    val ok = datatype match {
      // try_cast, not cast: under ANSI a malformed literal would THROW,
      // and the whole point here is to quarantine it as a row
      case "integer" => expr("try_cast(obj AS long)").isNotNull &&
        !col("obj").contains(".") && !col("obj").contains("e") &&
        !col("obj").contains("E")
      case "double" => expr("try_cast(obj AS double)").isNotNull
      case other => throw new IllegalArgumentException(
        s"unsupported sh:datatype $other — integer | double")
    }
    triples.filter(col("pred") === pred)
      .where(!coalesce(ok, lit(false)))
      .select("subj", "pred", "obj")
  }
}

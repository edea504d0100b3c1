package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KG observability / profiling statistics over a (subj, pred, obj)
  * triple table — the numbers an RDF store keeps for query optimization
  * and a pipeline operator publishes for dataset description:
  *
  *  - [[characteristicSets]]: Neumann & Moerkotte's characteristic sets
  *    (SIGMOD'11 cardinality-estimation statistic) — the distinct sorted
  *    predicate combination per subject, grouped with counts. Doubles as
  *    SCHEMA DISCOVERY over an emitted KG: each row is one "entity
  *    shape" and how many subjects share it.
  *  - [[predicateStats]]: VoID-style property-partition statistics
  *    (triples / distinct subjects / distinct objects per predicate).
  *
  * Both are two-shuffle aggregations (distinct + group), no driver-side
  * state; the characteristic-set string is sorted so the result is a
  * pure function of the triple SET.
  */
object KgStats {

  def characteristicSets(triples: DataFrame): DataFrame =
    triples
      .where(col("subj").isNotNull && col("pred").isNotNull)
      .select(col("subj"), col("pred")).distinct()
      .groupBy(col("subj"))
      .agg(concat_ws(" ", sort_array(collect_set(col("pred")))).as("char_set"))
      .groupBy(col("char_set"))
      .agg(count(lit(1)).as("n_subjects"))

  def predicateStats(triples: DataFrame): DataFrame =
    triples
      .where(col("pred").isNotNull)
      .groupBy(col("pred"))
      .agg(count(lit(1)).as("n_triples"),
        countDistinct(col("subj")).as("n_subjects"),
        countDistinct(col("obj")).as("n_objects"))
}

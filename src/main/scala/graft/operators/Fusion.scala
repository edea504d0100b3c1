package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Knowledge fusion — conflict resolution over repeated, possibly
  * contradictory observations of functional predicates: many turns
  * observe (subj, pred, obj, ts); exactly one object must win per
  * (subj, pred). The rule is deterministic and total:
  *
  *   support DESC (most-observed wins) →
  *   last_seen DESC (most recent evidence breaks support ties) →
  *   obj ASC (lexicographic tiebreak makes the result a pure function
  *            of the observation set — never of arrival order).
  *
  * Scale shape: two partial-aggregated groupBys and NOTHING else — the
  * argmax is computed by embedding the ordering INTO a struct
  * (min over (-support, -epoch(last_seen), obj, payload…), Spark compares
  * structs field-lexicographically), so there is no per-group window
  * sort: both aggregations map-side combine, and the (subj, pred) key
  * space is entity-scale. A row_number window would sort every group's
  * candidates; at 10^12 observations that sort is the bill.
  *
  * Carried alongside the winner: its support and [first_seen, last_seen]
  * validity interval, plus n_alternatives (distinct objects observed) —
  * the provenance downstream needs to audit a fusion decision.
  */
object Fusion {

  def resolve(obs: DataFrame): DataFrame = {
    val per = obs
      .where(col("obj").isNotNull && col("ts").isNotNull)
      .groupBy("subj", "pred", "obj")
      .agg(count(lit(1)).as("support"),
        min(col("ts")).as("first_seen"), max(col("ts")).as("last_seen"))
    per.groupBy("subj", "pred")
      .agg(
        min(struct(
          (-col("support")).as("_neg_support"),
          // NTZ-tolerant DESC embedding: cast-to-TIMESTAMP is identity
          // wall-clock under the engine's pinned-UTC session
          (-unix_micros(col("last_seen").cast("timestamp"))).as("_neg_seen"),
          col("obj"), col("support"), col("first_seen"), col("last_seen")))
          .as("w"),
        count(lit(1)).as("n_alternatives"))
      .select(col("subj"), col("pred"),
        col("w.obj").as("obj"), col("w.support").as("support"),
        col("w.first_seen").as("first_seen"),
        col("w.last_seen").as("last_seen"), col("n_alternatives"))
  }
}

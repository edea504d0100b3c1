package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data DECONTAMINATION against an evaluation/benchmark set —
  * the n-gram-overlap check every serious pretraining pipeline runs
  * (GPT-3's 13-gram dedup against its eval sets is the canonical shape)
  * so benchmark numbers measure generalization, not memorized test rows.
  *
  * Semantics: a training document's contamination is the fraction of its
  * DISTINCT k-word shingles (same tokenization as the dedup family:
  * lowercase, whitespace split — [[Dedup.wordShingles]], the codegen'd
  * scanner pinned in ShinglesSpec and cross-engine in q27/q71) that
  * appear anywhere in the eval set's shingle vocabulary.
  *
  * Scale shape at 100 TB: eval sets are tiny next to the corpus (10^4-10^7
  * n-grams), so the vocabulary rides a BROADCAST left join against the
  * exploded training shingles — one narrow pass over the corpus, one
  * aggregation shuffle keyed by doc id, no collect, no cross join. For an
  * eval set too large to broadcast, pass `broadcastEval = false` and the
  * same plan runs as a shuffle hash join keyed on the shingle — still
  * O(corpus shingles + vocab), never quadratic.
  */
object Decontam {

  /** Per-document contamination report: `(idCol, n_shingles, n_hits,
    * contamination)` — distinct-shingle count, how many of them occur in
    * the eval vocabulary, and the ratio. Every document appears (the
    * shingler emits at least one shingle even for short texts, matching
    * the q27-pinned semantics).
    */
  def contamination(train: DataFrame, evalSet: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      evalTextCol: String = "text", k: Int = 13,
      broadcastEval: Boolean = true): DataFrame = {
    val vocab0 = evalSet
      .select(explode(Dedup.wordShingles(col(evalTextCol), k)).as("_g"))
      .distinct()
      .withColumn("_hit", lit(1L))
    val vocab = if (broadcastEval) broadcast(vocab0) else vocab0
    // one pass: explode the (already distinct) per-doc shingles, LEFT join
    // the vocabulary, fold both counts in the same doc-keyed aggregation
    train
      .select(col(idCol), explode(Dedup.wordShingles(col(textCol), k)).as("_g"))
      .join(vocab, Seq("_g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum(col("_hit")), lit(0L)).as("n_hits"))
      .withColumn("contamination",
        col("n_hits").cast("double") /
          greatest(col("n_shingles"), lit(1L)).cast("double"))
  }

  /** The filter: training rows whose contamination is at or below
    * `maxContamination` (default 0.0 — drop anything sharing even one
    * k-gram with the eval set, the conservative pretraining default).
    * Schema-preserving: returns `train`'s own columns.
    */
  def decontaminate(train: DataFrame, evalSet: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      evalTextCol: String = "text", k: Int = 13,
      maxContamination: Double = 0.0,
      broadcastEval: Boolean = true): DataFrame = {
    val rep = contamination(train, evalSet, idCol, textCol, evalTextCol, k,
      broadcastEval)
      .where(col("contamination") <= maxContamination)
      .select(col(idCol))
    train.join(rep, Seq(idCol), "left_semi")
  }
}

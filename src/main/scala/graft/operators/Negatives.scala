package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-consistent negative sampling over a materialized (subj, pred, obj)
  * triple table — the corrupt-triple generator every KG-embedding trainer
  * (TransE/DistMult-family) needs downstream of triple emission.
  *
  * Semantics: for each positive triple and each slot k in [0, k), replace
  * the object with an entity drawn from the SAME predicate's object
  * vocabulary (type-consistent corruption — corrupting a `lang` triple
  * with an org surface teaches the model nothing), excluding the original
  * object, and — in the standard "filtered" setting (Bordes et al. 2013)
  * — excluding corruptions that happen to be true positives elsewhere in
  * the table, which would otherwise be trained on as false.
  *
  * Determinism at 10^12-triple scale: the draw is a pure CONTENT hash of
  * (subj, pred, obj, k, salt) mapped onto a dense per-predicate vocabulary
  * index — no RNG state, no partition-seeded `rand()`. Membership is
  * therefore stable under repartitioning, AQE re-plans, task retries, and
  * cluster size, and reproducible across engines: the q75 DuckDB oracle
  * recomputes the identical md5 draw, row_number vocabulary layout and
  * filtered anti-join, and the compare is value-exact (same rationale as
  * the Sampling family, q64-q66).
  *
  * Shuffle shape at scale: one distinct on (pred, obj) to build the
  * vocabulary (vocabulary cardinality = entities, orders of magnitude
  * below triples); vocabulary sizes broadcast (#predicates is small); the
  * fact-scale work is a narrow explode(k) + hash projection, one equi-join
  * of draws to the vocabulary on (pred, idx) (AQE broadcasts it when the
  * vocabulary fits), and the filtered anti-join back to positives on the
  * corrupted key. No fact×fact join anywhere.
  *
  * The dense index is assigned per predicate by a row_number window
  * (partitionBy pred): all distinct objects of one predicate sort within
  * one task — acceptable because that is vocabulary-sized, not
  * fact-sized; a predicate whose OBJECT VOCABULARY alone overflows a task
  * would need a zipWithIndex variant (not the case for entity-valued
  * predicates, whose vocab is the entity set).
  */
object Negatives {

  /** Dense per-predicate object vocabulary: (pred, obj, idx) with idx a
    * contiguous [0, n_pred) assignment in object sort order —
    * deterministic because (pred, obj) is distinct. Null objects are
    * excluded: they are not corruption candidates, and Spark's
    * NULLS-FIRST sort would shift every index off the DuckDB twin's
    * NULLS-LAST layout.
    */
  def objectVocab(positives: DataFrame): DataFrame =
    positives.select("pred", "obj")
      .where(col("pred").isNotNull && col("obj").isNotNull).distinct()
      .withColumn("idx",
        row_number().over(Window.partitionBy(col("pred")).orderBy(col("obj")))
          .cast("long") - 1)

  /** k corruption draws per positive. Output columns: subj, pred, obj
    * (the positive), neg_k (the slot), neg_obj (the corrupted object).
    * A slot whose draw lands on the original object — or, when `filtered`,
    * on another true positive — is dropped rather than redrawn, so a
    * positive yields UP TO k negatives (the standard filtered-sampling
    * contract; redraw loops are unbounded and partition-dependent).
    */
  def corrupt(positives: DataFrame, k: Int, salt: String = "graft",
      filtered: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // null-keyed positives are not corruptible observations (and would
    // silently vanish from concat_ws's hash input while DuckDB's ||
    // nulls the whole string — cross-engine divergence)
    val pos = positives.where(col("subj").isNotNull &&
      col("pred").isNotNull && col("obj").isNotNull)
    val vocab = objectVocab(pos)
    val sizes = vocab.groupBy("pred").agg(count(lit(1)).as("vocab_n"))
    val drawn = pos
      .join(broadcast(sizes), Seq("pred"))
      .withColumn("neg_k", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("idx",
        Sampling.hash32(concat_ws(":", col("subj"), col("pred"), col("obj"),
          col("neg_k"), lit(salt))) % col("vocab_n"))
    val negs = drawn
      .join(vocab.withColumnRenamed("obj", "neg_obj"), Seq("pred", "idx"))
      .filter(col("neg_obj") =!= col("obj"))
      .select("subj", "pred", "obj", "neg_k", "neg_obj")
    if (!filtered) negs
    else negs.join(
      pos.select(col("subj"), col("pred"), col("obj").as("neg_obj")),
      Seq("subj", "pred", "neg_obj"), "left_anti")
      .select("subj", "pred", "obj", "neg_k", "neg_obj")
  }
}

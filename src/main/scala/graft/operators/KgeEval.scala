package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KG-embedding link-prediction evaluation — the standard benchmark
  * protocol for the embeddings trained on the s6 triples + s8 negatives:
  * TransE scoring (Bordes et al. 2013) under the FILTERED setting.
  *
  * For each test triple (h, r, t), every candidate tail t' in the
  * per-relation tail vocabulary is scored ||E(h) + R(r) − E(t')||²; the
  * filtered rank of the true tail is 1 + #candidates scoring strictly
  * better, where candidates that are themselves true triples (other than
  * t) are excluded first and score ties break on candidate id ordering —
  * fully deterministic, so another engine can recompute every rank.
  *
  * Cross-engine-exact arithmetic: each squared difference is computed in
  * DOUBLE (float32 inputs widen exactly; per-element IEEE ops are
  * deterministic) and cast to DECIMAL before summation, making the sum
  * order-independent — rank comparisons are then pure decimal compares.
  *
  * Scale shape: |test| × |tail vocab(r)| scored rows (the protocol's
  * inherent cost), produced by an equi-join on the relation — the same
  * vocabulary-bounded fan-out as Negatives; embeddings join broadcast.
  */
object KgeEval {

  /** ||h + r − t||² with decimal-cast per-element terms (order-independent
    * exact sum; see object doc).
    */
  def transEDist(h: Column, r: Column, t: Column): Column = {
    val hd = h.cast("array<double>")
    val rd = r.cast("array<double>")
    val td = t.cast("array<double>")
    val diff = zip_with(zip_with(hd, rd, _ + _), td, _ - _)
    // acc (27,10) + term (25,10) = (28,10) under Spark's precision rules;
    // the cast back to (27,10) keeps the SCALE (no rounding) and the value
    // fits 17 integer digits by construction — so the fold stays exact,
    // where a 38-precision acc would silently drop to scale 9 per step
    aggregate(
      transform(diff, x => (x * x).cast("decimal(25,10)")),
      lit(0).cast("decimal(27,10)"),
      (acc, v) => (acc + v).cast("decimal(27,10)"))
  }

  /** [[transEDist]] in scale-10 FIXED POINT: each squared difference is
    * snapped to a long via `round(x²·1e10)` before the sum. This is the
    * scorer for vectors that are THEMSELVES fixed-point quantized (the
    * KgeTrain output): trained near-duplicates differ by single 1e-10
    * gradient quanta, so their distances can land exactly on a decimal
    * digit-10 boundary — where the double→DECIMAL(·,10) cast's halfway
    * rounding diverges between engines (shortest-string vs binary, the
    * q146 root cause) and would flip a strict rank comparison. Integer
    * snapping at the INTEGER boundary is the conversion both engines
    * answer identically, making ranks over trained vectors robust, not
    * just empirically green.
    */
  def transEDistFp(h: Column, r: Column, t: Column): Column = {
    val hd = h.cast("array<double>")
    val rd = r.cast("array<double>")
    val td = t.cast("array<double>")
    val diff = zip_with(zip_with(hd, rd, _ + _), td, _ - _)
    aggregate(
      transform(diff, x => round((x * x) * lit(1e10)).cast("long")),
      lit(0L), (acc, v) => acc + v)
  }

  /** DistMult score Σᵢ hᵢ·rᵢ·tᵢ (Yang et al. 2015) — the trilinear dot
    * product, HIGHER is better. Same exactness scheme as [[transEDist]]:
    * per-element products in double ((h·r)·t, left-assoc — the twin must
    * multiply in the same order), decimal-cast terms, order-independent
    * decimal fold.
    */
  def distMultScore(h: Column, r: Column, t: Column): Column = {
    val hd = h.cast("array<double>")
    val rd = r.cast("array<double>")
    val td = t.cast("array<double>")
    val prod = zip_with(zip_with(hd, rd, _ * _), td, _ * _)
    aggregate(
      transform(prod, x => x.cast("decimal(25,10)")),
      lit(0).cast("decimal(27,10)"),
      (acc, v) => (acc + v).cast("decimal(27,10)"))
  }

  /** The shared filtered-rank kernel both scorers (and both protocol
    * sides) instantiate: candidates from the per-relation vocabulary,
    * true triples excluded from the competition, rank = 1 + #candidates
    * strictly better (direction set by `higherIsBetter`), ties on
    * candidate id. The eval harness proving it GENERALIZES across
    * scoring functions is the point — a second scorer is one Column
    * function, not a second pipeline.
    */
  private def filteredRanks(test: DataFrame, all: DataFrame,
      entEmb: DataFrame, relEmb: DataFrame, headSide: Boolean,
      score: (Column, Column, Column) => Column,
      higherIsBetter: Boolean): DataFrame = {
    val candCol = if (headSide) "h" else "t"
    val cand = all.select(col("r"), col(candCol).as("cand")).distinct()
    val tst = test
      .join(entEmb.select(col("node").as("h"), col("vec").as("hv")), Seq("h"))
      .join(entEmb.select(col("node").as("t"), col("vec").as("tv")), Seq("t"))
      .join(relEmb.select(col("rel").as("r"), col("vec").as("rv")), Seq("r"))
      .withColumn("tdist", score(col("hv"), col("rv"), col("tv")))
    // filtered setting: a candidate that is a TRUE triple on this side
    // (and is not the evaluated entity) never competes
    val truth =
      if (headSide) all.select(col("h").as("cand"), col("r"), col("t"))
      else all.select(col("h"), col("r"), col("t").as("cand"))
    val truthKeys = if (headSide) Seq("cand", "r", "t") else Seq("h", "r", "cand")
    val scored = tst.join(cand, Seq("r"))
      .join(entEmb.select(col("node").as("cand"), col("vec").as("cv")),
        Seq("cand"))
      .join(truth.distinct().withColumn("istrue", lit(1)), truthKeys, "left")
      .where(col("istrue").isNull || col("cand") === col(candCol))
      .withColumn("cdist",
        if (headSide) score(col("cv"), col("rv"), col("tv"))
        else score(col("hv"), col("rv"), col("cv")))
    val better =
      if (higherIsBetter) col("cdist") > col("tdist")
      else col("cdist") < col("tdist")
    scored.groupBy(col("h"), col("r"), col("t"))
      .agg((lit(1L) + sum(when(better ||
        (col("cdist") === col("tdist") && col("cand") < col(candCol)), 1L)
        .otherwise(0L))).as("rank"))
  }

  /** Filtered tail ranks. `test` ⊆ `all` are (h, r, t) triples; `entEmb`
    * is (node, vec), `relEmb` (rel, vec). Returns (h, r, t, rank).
    */
  def tailRanks(test: DataFrame, all: DataFrame, entEmb: DataFrame,
      relEmb: DataFrame): DataFrame =
    filteredRanks(test, all, entEmb, relEmb, headSide = false,
      transEDist, higherIsBetter = false)

  /** Filtered HEAD ranks — the other half of the protocol: candidates
    * h' from the per-relation head vocabulary scored
    * ||E(h') + R(r) − E(t)||². Same filtering and tie rules as
    * [[tailRanks]]. Returns (h, r, t, rank).
    */
  def headRanks(test: DataFrame, all: DataFrame, entEmb: DataFrame,
      relEmb: DataFrame): DataFrame =
    filteredRanks(test, all, entEmb, relEmb, headSide = true,
      transEDist, higherIsBetter = false)

  /** Filtered tail ranks under the FIXED-POINT scorer — the protocol
    * instantiation for TRAINED (fixed-point-quantized) vectors; see
    * [[transEDistFp]].
    */
  def tailRanksFp(test: DataFrame, all: DataFrame, entEmb: DataFrame,
      relEmb: DataFrame): DataFrame =
    filteredRanks(test, all, entEmb, relEmb, headSide = false,
      transEDistFp, higherIsBetter = false)

  /** DistMult filtered ranks through the SAME protocol (similarity is
    * maximized where TransE distance is minimized).
    */
  def distMultTailRanks(test: DataFrame, all: DataFrame, entEmb: DataFrame,
      relEmb: DataFrame): DataFrame =
    filteredRanks(test, all, entEmb, relEmb, headSide = false,
      distMultScore, higherIsBetter = true)

  def distMultHeadRanks(test: DataFrame, all: DataFrame, entEmb: DataFrame,
      relEmb: DataFrame): DataFrame =
    filteredRanks(test, all, entEmb, relEmb, headSide = true,
      distMultScore, higherIsBetter = true)

  /** Protocol metrics over a rank frame: MRR and Hits@k. Double-valued
    * (reporting surface; the cross-engine gate is the rank frame itself).
    */
  def metrics(ranks: DataFrame, ks: Seq[Int] = Seq(1, 3, 10)): DataFrame = {
    val hits = ks.map(k =>
      avg(when(col("rank") <= k, 1.0).otherwise(0.0)).as(s"hits_at_$k"))
    ranks.agg(count(lit(1)).as("n"),
      avg(lit(1.0) / col("rank")).as("mrr") +: hits: _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic TransE training (Bordes et al. 2013) — one FULL-BATCH
  * epoch of the margin-ranking loss, re-expressed so that (a) it is a
  * pure aggregation job a 1000-executor cluster runs as two shuffles,
  * and (b) another engine can replay it value-exact (the q146/q147
  * oracle gates): no RNG, no sequential SGD order.
  *
  *  - Negative sampling is a CONTENT-HASH draw: the caller supplies a
  *    deterministic BIGINT `negSeed` column over (h, r, t); the corrupt
  *    tail is the vocabulary entity at dense rank `negSeed mod |vocab|`
  *    (ranks are a bijection, so no ties). One draw per positive.
  *  - The classic per-triple SGD walk is order-dependent and therefore
  *    neither distributed nor replayable; the full-batch subgradient
  *    step (all triples score against the SAME epoch-start embeddings,
  *    contributions summed, one update at the end) is the standard
  *    deterministic re-expression and is what a data-parallel trainer
  *    computes per synchronous step anyway.
  *  - Arithmetic is FIXED-POINT at scale 10: every per-element value is
  *    computed in DOUBLE (IEEE ops are engine-independent) and snapped
  *    to a long via `round(x · 1e10)` before any summation. Integer
  *    sums are exact and shuffle-order-free, and — unlike a
  *    double→DECIMAL(·,10) cast, whose half-way-at-digit-10 behavior
  *    differs between engines' shortest-string vs binary conversions —
  *    rounding a double at an INTEGER boundary is unambiguous: x.5 is
  *    exactly representable, so "half away from zero" answers the same
  *    question for the binary value and its decimal rendering in every
  *    engine. (Round-4's q76 BIGINT-rank emission, promoted from the
  *    output layer into the whole kernel.)
  *
  * Loss per positive (h,r,t) with draw t': L = max(0, γ + d − d') with
  * d = ‖h+r−t‖², d' = ‖h+r−t'‖² (both scale-10 fixed point). Active
  * triples (γ_fp + d_fp > d'_fp, exact longs) contribute subgradients
  *   ∂h = ∂r = 2(h+r−t) − 2(h+r−t'),  ∂t = −2(h+r−t),  ∂t' = +2(h+r−t')
  * as separate fp(±2·lr·component) terms (the learning rate folds into
  * the double product; the integer layer only ever adds), summed per
  * (node, component) and subtracted from fp(epoch-start value).
  *
  * Overflow audit at scale 10: components |x| ≤ ~4 → d ≤ 64·fp(16) ≈
  * 10^13; a term ≤ fp(0.02·4) ≈ 10^9, so a node in 10^6 active triples
  * sums to ~10^15 — far inside long range.
  *
  * Scale shape: the gradient shuffle is |active triples| × dim rows —
  * linear in data — grouped on (node, idx); the vocabulary dense-rank
  * is ONE entity-scale sort (same class as Negatives' vocabulary
  * draws; a store keeps this index precomputed). Embedding joins are
  * broadcast-sized by the vocabulary bound.
  */
object KgeTrain {

  /** Exploded updated embeddings: (node|rel, idx, val_fp: LONG at
    * scale 10 — i.e. value × 10^10, rounded half away from zero).
    */
  final case class Trained(entUpd: DataFrame, relUpd: DataFrame)

  /** Scale-10 fixed-point snap: round(x · 1e10) as a long. */
  private def fp(c: Column): Column = round(c * lit(1e10)).cast("long")

  def transEEpoch(pos: DataFrame, entEmb: DataFrame, relEmb: DataFrame,
      negSeed: Column, lr: Double = 0.01, margin: Double = 1.0): Trained = {
    val vocab = denseRankVocab(entEmb)
    epochImpl(pos, entEmb, relEmb, negSeed, lr, margin, vocab, vocab.count())
  }

  /** The negative-draw index: every entity at its dense rank in node
    * order — ONE entity-scale global sort (the same class of cost as
    * Negatives' vocabulary draws; a store keeps this precomputed).
    * Epoch-invariant, so [[transETrain]] computes it once and threads
    * it through every epoch.
    */
  private def denseRankVocab(entEmb: DataFrame): DataFrame =
    entEmb.select(col("node")).distinct()
      .withColumn("nrank",
        row_number().over(Window.orderBy(col("node"))) - 1)
      .localCheckpoint(true)

  private def epochImpl(pos: DataFrame, entEmb: DataFrame, relEmb: DataFrame,
      negSeed: Column, lr: Double, margin: Double,
      vocab: DataFrame, vsize: Long): Trained = {
    val withNeg = pos.select(col("h"), col("r"), col("t"),
        pmod(negSeed, lit(vsize)).as("nrank"))
      .join(vocab.withColumnRenamed("node", "tneg"), Seq("nrank"))
      // a draw that hits the true tail contributes exactly zero (its
      // pos/neg terms cancel in fixed point) — dropped up front
      .where(col("tneg") =!= col("t"))

    val j = withNeg
      .join(entEmb.select(col("node").as("h"), col("vec").as("hv")), Seq("h"))
      .join(entEmb.select(col("node").as("t"), col("vec").as("tv")), Seq("t"))
      .join(entEmb.select(col("node").as("tneg"), col("vec").as("nv")),
        Seq("tneg"))
      .join(relEmb.select(col("rel").as("r"), col("vec").as("rv")), Seq("r"))
    val hd = col("hv").cast("array<double>")
    val rd = col("rv").cast("array<double>")
    val td = col("tv").cast("array<double>")
    val nd = col("nv").cast("array<double>")
    def sq(arr: Column): Column = aggregate(
      transform(arr, x => fp(x * x)), lit(0L), (acc, v) => acc + v)
    val scored = j
      .withColumn("diff", zip_with(zip_with(hd, rd, _ + _), td, _ - _))
      .withColumn("diffn", zip_with(zip_with(hd, rd, _ + _), nd, _ - _))
      .withColumn("d", sq(col("diff")))
      .withColumn("dn", sq(col("diffn")))
    // active: γ + d > d' in exact scale-10 longs
    val marginFp = math.round(margin * 1e10)
    val act = scored.where(col("d") + lit(marginFp) > col("dn"))
      .select(col("h"), col("r"), col("t"), col("tneg"),
        col("diff"), col("diffn"))
      .localCheckpoint()

    // one fp(±2·lr·component) term per (target node, component): 2·lr
    // folds into the double product, the long layer never multiplies
    def terms(target: String, arr: String, sign: Double): DataFrame =
      act.select(col(target).as("node"),
          posexplode(col(arr)).as(Seq("idx", "dv")))
        .select(col("node"), col("idx"),
          fp(col("dv") * lit(sign * 2.0 * lr)).as("term"))
    def fold(streams: Seq[DataFrame]): DataFrame =
      streams.reduce(_ unionAll _)
        .groupBy(col("node"), col("idx"))
        .agg(sum(col("term")).as("grad"))

    // ∂h and ∂r share the same two streams (+diff, −diffn); they land
    // in different tables, so the streams are built per key column
    val entGrad = fold(Seq(
      terms("h", "diff", +1.0), terms("h", "diffn", -1.0),
      terms("t", "diff", -1.0), terms("tneg", "diffn", +1.0)))
    val relGrad = fold(Seq(
      terms("r", "diff", +1.0), terms("r", "diffn", -1.0)))

    def applyGrad(emb: DataFrame, key: String, grad: DataFrame): DataFrame =
      emb.select(col(key),
          posexplode(col("vec").cast("array<double>")).as(Seq("idx", "v0")))
        .join(grad.withColumnRenamed("node", key), Seq(key, "idx"), "left")
        .select(col(key), col("idx"),
          (fp(col("v0")) - coalesce(col("grad"), lit(0L))).as("val_fp"))

    Trained(
      applyGrad(entEmb, "node", entGrad),
      applyGrad(relEmb, "rel", relGrad))
  }

  /** `epochs` sequential full-batch epochs: each epoch's fixed-point
    * output re-assembles into the next epoch's input embeddings
    * (checkpointed per epoch — the superstep-lineage rule). `negSeed`
    * maps the epoch number to the draw column so callers can vary the
    * corruption per epoch (e.g. `e => col("seed") + lit(e * 7919L)`)
    * or hold it fixed. Deterministic end to end: same inputs, same
    * trained vectors, any cluster size.
    */
  def transETrain(pos: DataFrame, entEmb: DataFrame, relEmb: DataFrame,
      negSeed: Int => Column, epochs: Int, lr: Double = 0.01,
      margin: Double = 1.0): (DataFrame, DataFrame) = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    // the vocabulary (and so the draw index) is epoch-invariant —
    // assembleVecs preserves keys — so the entity-scale sort and its
    // count run ONCE, not per epoch
    val vocab = denseRankVocab(entEmb)
    val vsize = vocab.count()
    var ent = entEmb
    var rel = relEmb
    (1 to epochs).foreach { e =>
      val t = epochImpl(pos, ent, rel, negSeed(e), lr, margin, vocab, vsize)
      ent = assembleVecs(t.entUpd, "node").localCheckpoint(true)
      rel = assembleVecs(t.relUpd, "rel").localCheckpoint(true)
    }
    (ent, rel)
  }

  /** Re-assemble an exploded (key, idx, val_fp) frame into (key, vec)
    * with `vec: array<double>` (components = val_fp / 10^10 — an exact
    * IEEE division by a power of ten's double, identical in every
    * engine) — the shape [[KgeEval]] consumes. Ordering by idx inside
    * each key is explicit (struct-sorted collect), so the result is
    * deterministic under any shuffle.
    */
  def assembleVecs(exploded: DataFrame, keyCol: String,
      vecCol: String = "vec"): DataFrame =
    exploded.groupBy(col(keyCol))
      .agg(transform(
        sort_array(collect_list(struct(col("idx"), col("val_fp")))),
        x => x.getField("val_fp").cast("double") / lit(1e10)).as(vecCol))
}

package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._

import graft.operators.{KgeEval, KgeTrain}

/** The deterministic full-batch TransE epoch vs a driver-local
  * fixed-point replay of its own contract (double per-element work,
  * round(x·1e10) scale-10 long snaps, order-free integer sums) — the
  * same replay the DuckDB oracle twin performs. Plus: inactive triples
  * contribute nothing, the epoch reduces the margin loss on a fixture
  * whose positives are geometrically separable, and assembleVecs feeds
  * KgeEval.
  */
class KgeTrainSpec extends SparkSpec {

  import spark.implicits._

  private val lr = 0.01
  private val margin = 1.0

  /** Scale-10 fixed-point snap, replicating Spark's round-on-double
    * (BigDecimal HALF_UP — equal to binary half-away-from-zero at
    * integer boundaries, see KgeTrain doc).
    */
  private def fpl(x: Double): Long =
    JBD.valueOf(x * 1e10).setScale(0, RoundingMode.HALF_UP).longValueExact

  /** Driver-local epoch replay per the KgeTrain contract. */
  private def refEpoch(
      pos: Seq[(String, String, String)],
      ent: Map[String, Seq[Double]],
      rel: Map[String, Seq[Double]],
      seed: (String, String, String) => Long)
      : (Map[String, Seq[Long]], Map[String, Seq[Long]]) = {
    val vocab = ent.keys.toSeq.sorted
    val dim = ent.values.head.length
    val entG = scala.collection.mutable.Map.empty[(String, Int), Long]
    val relG = scala.collection.mutable.Map.empty[(String, Int), Long]
    def add(m: scala.collection.mutable.Map[(String, Int), Long],
        k: (String, Int), v: Long): Unit =
      m(k) = m.getOrElse(k, 0L) + v
    pos.foreach { case (h, r, t) =>
      val tneg = vocab(((seed(h, r, t) % vocab.length) +
        vocab.length).toInt % vocab.length)
      if (tneg != t) {
        val diff = (0 until dim).map(i => ent(h)(i) + rel(r)(i) - ent(t)(i))
        val diffn = (0 until dim).map(i => ent(h)(i) + rel(r)(i) - ent(tneg)(i))
        val d = diff.map(x => fpl(x * x)).sum
        val dn = diffn.map(x => fpl(x * x)).sum
        if (d + fpl(margin) > dn) {
          (0 until dim).foreach { i =>
            val pt = fpl(diff(i) * (2.0 * lr))
            val nt = fpl(diffn(i) * (-2.0 * lr))
            add(entG, (h, i), pt); add(entG, (h, i), nt)
            add(relG, (r, i), pt); add(relG, (r, i), nt)
            add(entG, (t, i), fpl(diff(i) * (-2.0 * lr)))
            add(entG, (tneg, i), fpl(diffn(i) * (2.0 * lr)))
          }
        }
      }
    }
    def upd(emb: Map[String, Seq[Double]],
        g: scala.collection.Map[(String, Int), Long]) =
      emb.map { case (k, vs) =>
        k -> vs.zipWithIndex.map { case (v, i) =>
          fpl(v) - g.getOrElse((k, i), 0L)
        }
      }
    (upd(ent, entG), upd(rel, relG))
  }

  private val entFix = Map(
    "a" -> Seq(0.10, 0.90), "b" -> Seq(0.50, 0.25), "c" -> Seq(-0.30, 0.40),
    "d" -> Seq(0.80, -0.60), "e" -> Seq(0.05, 0.05))
  private val relFix = Map("r1" -> Seq(0.20, -0.10), "r2" -> Seq(-0.40, 0.30))
  private val posFix = Seq(
    ("a", "r1", "b"), ("b", "r1", "c"), ("c", "r2", "d"), ("a", "r2", "e"))
  private def seedOf(h: String, r: String, t: String): Long =
    h.hashCode.toLong * 31 + t.hashCode.toLong * 17 + r.length

  private def frames = {
    val pos = posFix.toDF("h", "r", "t")
    val ent = entFix.toSeq.map { case (k, v) => (k, v) }.toDF("node", "vec")
    val rel = relFix.toSeq.map { case (k, v) => (k, v) }.toDF("rel", "vec")
    (pos, ent, rel)
  }
  test("engine epoch == driver-local BigDecimal replay, value-exact") {
    val (pos, ent, rel) = frames
    // seed must be expressible identically on both sides: use the same
    // hashCode arithmetic via a lookup joined in (the ORACLE uses pure
    // integer arithmetic on its fixture ids; here the lookup IS the
    // deterministic function)
    val seeds = posFix.map(p => (p._1, p._2, p._3, seedOf(p._1, p._2, p._3)))
      .toDF("h", "r", "t", "negseed")
    val posSeeded = pos.join(seeds, Seq("h", "r", "t"))
    val got = KgeTrain.transEEpoch(posSeeded, ent, rel, col("negseed"),
      lr, margin)
    val (refEnt, refRel) = refEpoch(posFix, entFix, relFix, seedOf)
    val gotEnt = got.entUpd.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val gotRel = got.relUpd.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    refEnt.foreach { case (k, vs) =>
      vs.zipWithIndex.foreach { case (v, i) =>
        assert(gotEnt((k, i)) === v, s"ent $k[$i]")
      }
    }
    refRel.foreach { case (k, vs) =>
      vs.zipWithIndex.foreach { case (v, i) =>
        assert(gotRel((k, i)) === v, s"rel $k[$i]")
      }
    }
    assert(gotEnt.size === entFix.size * 2)
  }

  test("epoch reduces total margin loss; a second epoch composes") {
    val (pos, ent, rel) = frames
    val seeds = posFix.map(p => (p._1, p._2, p._3, seedOf(p._1, p._2, p._3)))
      .toDF("h", "r", "t", "negseed")
    val posSeeded = pos.join(seeds, Seq("h", "r", "t"))
    def loss(entDf: org.apache.spark.sql.DataFrame,
        relDf: org.apache.spark.sql.DataFrame): Double = {
      val j = posSeeded
        .join(entDf.select(col("node").as("h"), col("vec").as("hv")), Seq("h"))
        .join(entDf.select(col("node").as("t"), col("vec").as("tv")), Seq("t"))
        .join(relDf.select(col("rel").as("r"), col("vec").as("rv")), Seq("r"))
      // proxy: positive distances should shrink relative to margin
      j.select(KgeEval.transEDist(col("hv"), col("rv"), col("tv"))
          .cast("double").as("d"))
        .agg(sum("d")).head().getDouble(0)
    }
    val before = loss(ent, rel)
    val t1 = KgeTrain.transEEpoch(posSeeded, ent, rel, col("negseed"), lr, margin)
    val ent1 = KgeTrain.assembleVecs(t1.entUpd, "node")
    val rel1 = KgeTrain.assembleVecs(t1.relUpd, "rel")
    val after = loss(ent1, rel1)
    assert(after < before,
      s"one epoch must reduce summed positive distance: $before -> $after")
    // composes: the assembled output is valid input for epoch 2
    val t2 = KgeTrain.transEEpoch(posSeeded, ent1, rel1, col("negseed"), lr, margin)
    val ent2 = KgeTrain.assembleVecs(t2.entUpd, "node")
    assert(ent2.count() === entFix.size.toLong)
    // and valid input for the eval kernel
    val ranks = KgeEval.tailRanks(posSeeded.select("h", "r", "t"),
      posSeeded.select("h", "r", "t"), ent1, rel1)
    assert(ranks.count() === posFix.length.toLong)
    // multi-epoch driver: three epochs keep reducing the loss proxy,
    // and epoch-varied seeds flow through the negSeed function
    val (ent3, rel3) = KgeTrain.transETrain(posSeeded, ent, rel,
      e => col("negseed") + lit(e.toLong * 7919L), epochs = 3, lr, margin)
    val after3 = loss(ent3, rel3)
    assert(after3 < before,
      s"three epochs must reduce summed positive distance: $before -> $after3")
    assert(ent3.count() === entFix.size.toLong)
  }
}

package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ground-truth generation (SURVEY §2.5 G1-G4): label each turn with the
  * category of the most cosine-similar annotation value, threshold-gated.
  *
  * The reference fits a tiny CountVectorizer per (chunk, annotation) pair
  * (PrepareTrainData.py:104-120); cosine is invariant to extending both
  * vectors with shared-vocabulary zeros, so computing counts over each
  * text independently gives the same value — we use 1..2-gram token count
  * maps per side and a sparse dot product, row-local after an equi-join on
  * conv_id (J3/E4: the join key bounds the pair explosion).
  */
object GroundTruth {

  private def grams(s: String): Map[String, Int] = {
    val toks = "\\b[^\\d\\W]+\\b".r.findAllIn(s.toLowerCase).toArray
    val uni = toks.toSeq
    val bi = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    (uni ++ bi).groupBy(identity).map { case (k, v) => k -> v.size }
  }

  def cosine(a: String, b: String): Double = cosineGrams(grams(a), grams(b))

  private def cosineGrams(ga: Map[String, Int], gb: Map[String, Int]): Double = {
    if (ga.isEmpty || gb.isEmpty) return 0.0
    val dot = ga.iterator.map { case (k, v) => v.toDouble * gb.getOrElse(k, 0) }.sum
    val na = math.sqrt(ga.values.map(v => v.toDouble * v).sum)
    val nb = math.sqrt(gb.values.map(v => v.toDouble * v).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  /** turns(conv_id, turn_idx, text_clean) × annotations(conv_id, category,
    * ann_text) -> (conv_id, turn_idx, text_clean, category, similarity):
    * per-turn argmax (G3; ties -> first by category order after sort) at
    * similarity ≥ threshold (G4; reference sweeps 0.30/0.35/0.40).
    */
  def label(turns: DataFrame, annotations: DataFrame, threshold: Double = 0.35)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // tokenize each side ONCE before the conv-keyed join — computing
    // grams per PAIR re-tokenized every annotation T times and every turn
    // A times for a conv with T turns × A annotations
    val turnTok = turns.select("conv_id", "turn_idx", "text_clean")
      .as[(String, Int, String)]
      .map { case (cid, idx, text) => (cid, idx, text, grams(text)) }
      .toDF("conv_id", "turn_idx", "text_clean", "turn_grams")
    val annTok = annotations.select("conv_id", "category", "ann_text")
      .as[(String, String, String)]
      .map { case (cid, cat, ann) => (cid, cat, grams(ann)) }
      .toDF("conv_id", "category", "ann_grams")
    val pairs = turnTok.join(annTok, "conv_id")
      .as[(String, Int, String, Map[String, Int], String, Map[String, Int])]
      .map { case (cid, idx, text, gt, cat, gann) =>
        (cid, idx, text, cat, cosineGrams(gt, gann))
      }
      .toDF("conv_id", "turn_idx", "text_clean", "category", "similarity")
    val w = Window.partitionBy("conv_id", "turn_idx")
      .orderBy(desc("similarity"), asc("category"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("similarity") >= threshold)
      .drop("rn")
  }
}

package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over an edge list by alternating min-label
  * propagation on DataFrames (Pregel-style; no GraphFrames dependency —
  * SURVEY §7.3). Each superstep localCheckpoints to cut lineage
  * (north_rule), converges when no label changes.
  */
object ConnectedComponents {

  /** vertices(id: Long), edges(src: Long, dst: Long) -> (id, component)
    * where component = min vertex id of the component.
    */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20)(
      implicit spark: SparkSession): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    var labels = vertices.select(col("id"), col("id").as("component")).localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val neigh = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src")).agg(min(col("component")).as("ncomp"))
      val next = labels.join(neigh, labels("id") === neigh("src"), "left")
        .select(labels("id"),
          least(coalesce(col("ncomp"), col("component")), col("component")).as("component"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.component") =!= col("o.component")).count()
      labels = next
      iter += 1
    }
    labels
  }
}

/** S4 — entity linking (north_rule mandate): MinHash-LSH blocking over
  * character-shingle sets of mention surfaces, candidate scoring by
  * Jaccard distance, canonicalization via connected components; canonical
  * surface = most frequent member (lexicographic min tie-break). The
  * reference's nearest kin are the ground-truth similarity ops G1/G2 and
  * the dead DBSCAN path X17 (SURVEY §2.6).
  */
object Linking {

  /** 3-char shingles of the lowercase surface, as a Column. */
  private def shingles(c: org.apache.spark.sql.Column) = {
    val s = lower(c)
    array_distinct(
      transform(sequence(lit(0), greatest(length(s) - 3, lit(0))),
        i => s.substr(i + 1, lit(3))))
  }

  /** mentions(surface) -> (surface, canonical). Distinct surfaces only go
    * through LSH — at 10^12 mentions the distinct() collapses to entity
    * vocabulary scale before any pairwise work, and LSH bands bound the
    * candidate pairs instead of an O(n²) self-join.
    */
  def canonicalize(mentions: DataFrame, jaccardDistance: Double = 0.5)(
      implicit spark: SparkSession): DataFrame = {
    val counts = mentions.groupBy("surface").agg(count(lit(1)).as("freq"))
    val nodes = counts
      .withColumn("id", xxhash64(lower(col("surface"))))
      .withColumn("shingles", shingles(col("surface")))
      .filter(size(col("shingles")) > 0)
      .localCheckpoint()

    val htf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feats = htf.transform(nodes)
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(4).setSeed(42)
    val model = mh.fit(feats)
    val pairs = model.approxSimilarityJoin(feats, feats, jaccardDistance, "dist")
      .select(col("datasetA.id").as("src"), col("datasetB.id").as("dst"))
      .filter(col("src") < col("dst"))

    val comps = ConnectedComponents.run(nodes.select("id"), pairs)
    val labeled = nodes.join(comps, "id")
    val w = Window.partitionBy("component").orderBy(desc("freq"), asc("surface"))
    val canon = labeled
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("component"), col("surface").as("canonical"))
    labeled.join(canon, "component").select("surface", "canonical")
  }
}

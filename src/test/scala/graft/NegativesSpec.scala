package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Negatives

/** Negative sampling for KG-embedding training: type consistency, the
  * filtered-setting guarantee, determinism under layout changes, and the
  * per-positive slot contract.
  */
class NegativesSpec extends SparkSpec {

  import spark.implicits._

  /** Two predicates with overlapping subject space and disjoint object
    * vocabularies; `lives_in` has a deliberately large vocabulary so most
    * draws survive the self/filtered exclusions, `works_at` a tiny one so
    * the exclusion paths are actually exercised.
    */
  private lazy val positives: DataFrame = {
    val cities = (0 until 40).map(i => f"city_$i%02d")
    val orgs = Seq("acme", "globex", "initech")
    val rows =
      (0 until 120).map(i => (s"p$i", "lives_in", cities(i % cities.size))) ++
      (0 until 90).map(i => (s"p$i", "works_at", orgs(i % orgs.size)))
    rows.toDF("subj", "pred", "obj").cache()
  }

  test("objectVocab: dense contiguous per-predicate index in object order") {
    val v = Negatives.objectVocab(positives).collect()
    val byPred = v.groupBy(_.getString(0))
    assert(byPred("lives_in").length == 40)
    assert(byPred("works_at").length == 3)
    for ((_, rows) <- byPred) {
      val sorted = rows.sortBy(_.getString(1))
      assert(sorted.map(_.getLong(2)).toSeq == sorted.indices.map(_.toLong),
        "idx must be 0..n-1 in object sort order")
    }
  }

  test("corrupt: type-consistent, never the original object, never a positive") {
    val neg = Negatives.corrupt(positives, k = 3, salt = "t").collect()
    assert(neg.nonEmpty)
    val vocab = positives.select("pred", "obj").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val pos = positives.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    for (r <- neg) {
      val (s, p, o, no) =
        (r.getString(0), r.getString(1), r.getString(2), r.getString(4))
      assert(vocab((p, no)), s"$no must come from $p's own vocabulary")
      assert(no != o, "self-corruption must be excluded")
      assert(!pos((s, p, no)), s"filtered setting: ($s,$p,$no) is a true positive")
    }
  }

  test("corrupt: unfiltered keeps true-positive corruptions, still no self") {
    val unf = Negatives.corrupt(positives, k = 3, salt = "t", filtered = false)
    val fil = Negatives.corrupt(positives, k = 3, salt = "t")
    assert(unf.count() >= fil.count())
    assert(unf.filter(col("neg_obj") === col("obj")).count() == 0)
    // the dropped rows are exactly the true-positive collisions
    val dropped = unf.join(fil, Seq("subj", "pred", "obj", "neg_k", "neg_obj"),
      "left_anti")
    val posKeyed = positives.select(col("subj"), col("pred"),
      col("obj").as("neg_obj"))
    assert(dropped.join(posKeyed, Seq("subj", "pred", "neg_obj"), "left_anti")
      .count() == 0)
  }

  test("corrupt: at most k slots per positive, slots in [0, k)") {
    val neg = Negatives.corrupt(positives, k = 2, salt = "t")
    assert(neg.filter(col("neg_k") < 0 || col("neg_k") >= 2).count() == 0)
    val over = neg.groupBy("subj", "pred", "obj")
      .agg(count(lit(1)).as("n"), countDistinct(col("neg_k")).as("nd"))
      .filter(col("n") > 2 || col("n") =!= col("nd"))
    assert(over.count() == 0, "duplicate slots for one positive")
  }

  test("corrupt: deterministic under repartitioning; salt changes the draw") {
    def key(df: DataFrame): Set[(String, String, String, Int, String)] =
      df.select("subj", "pred", "obj", "neg_k", "neg_obj")
        .as[(String, String, String, Int, String)].collect().toSet
    val a = key(Negatives.corrupt(positives, k = 2, salt = "t"))
    val b = key(Negatives.corrupt(
      positives.repartition(13, col("obj")), k = 2, salt = "t"))
    assert(a == b, "draw must be a pure function of content, not layout")
    val c = key(Negatives.corrupt(positives, k = 2, salt = "other"))
    assert(a != c, "distinct salts must give independent draws")
  }

  test("corrupt: null-keyed positives are excluded, not hashed or drawn") {
    val withNulls = positives.unionAll(Seq(
      (null.asInstanceOf[String], "lives_in", "city_00"),
      ("p0", "lives_in", null.asInstanceOf[String])
    ).toDF("subj", "pred", "obj"))
    // vocabulary must not shift (Spark NULLS FIRST would displace idx 0)
    val v = Negatives.objectVocab(withNulls).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(v.keys.forall(_._2 != null) && v(("lives_in", "city_00")) == 0L)
    val a = Negatives.corrupt(positives, k = 2, salt = "t")
      .collect().map(_.toSeq).toSet
    val b = Negatives.corrupt(withNulls, k = 2, salt = "t")
      .collect().map(_.toSeq).toSet
    assert(a == b, "null rows must not change any draw")
  }

  test("corrupt: large-vocab predicate yields close to k negatives each") {
    val neg = Negatives.corrupt(positives, k = 4, salt = "t")
      .filter(col("pred") === "lives_in")
    // 120 positives x 4 slots; expected loss ~2/40 per slot (self + the
    // one other positive city any subject could collide with)
    val n = neg.count()
    assert(n >= 120 * 4 * 0.80, s"kept only $n of ${120 * 4} slots")
  }
}

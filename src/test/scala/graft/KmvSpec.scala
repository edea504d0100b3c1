package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvFunctions
import graft.operators.Cardinality

/** KMV cardinality sketch: k-min-distinct state semantics, map-side merge
  * determinism, the exact under-fill branch, and estimator accuracy.
  */
class KmvSpec extends SparkSpec {

  import spark.implicits._

  test("kmv_sketch: ascending k smallest distinct values, dups collapsed") {
    val df = Seq(5L, 3L, 9L, 3L, 1L, 7L, 1L).toDF("h")
    val got = df.agg(KmvFunctions.kmv_sketch(col("h"), 3)).head()
      .getSeq[Long](0)
    assert(got == Seq(1L, 3L, 5L))
    // under-fill keeps everything
    val all = df.agg(KmvFunctions.kmv_sketch(col("h"), 100)).head()
      .getSeq[Long](0)
    assert(all == Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("kmv_sketch: partition layout cannot change the state") {
    val df = spark.range(0, 5000).select(
      Cardinality.hash32(col("id"), "t").as("h"))
    val a = df.agg(KmvFunctions.kmv_sketch(col("h"), 64)).head().getSeq[Long](0)
    val b = df.repartition(13).agg(KmvFunctions.kmv_sketch(col("h"), 64))
      .head().getSeq[Long](0)
    assert(a == b && a.size == 64 && a == a.sorted)
  }

  test("kmvDistinct: exact when under-full, ~1/sqrt(k) when estimating") {
    val docs = spark.range(0, 10000).select(col("id"),
      (col("id") % 10).as("g"), concat(lit("key"), col("id")).as("key"))
    // global: 10k distinct keys, k=256 -> estimator branch, ~6% expected
    val est = Cardinality.kmvDistinct(docs, col("key"), 256).head()
      .getAs[Double]("est")
    assert(math.abs(est - 10000) / 10000 < 0.2, s"est $est vs 10000")
    // per-group: 1000 distinct each with k=2048 -> exact branch
    val g = Cardinality.kmvDistinct(docs, col("key"), 2048, Seq(col("g")))
      .collect().map(r => r.getAs[Long]("g") -> r.getAs[Double]("est")).toMap
    assert(g.size == 10 && g.values.forall(_ == 1000.0))
  }

  test("kmvDistinct: duplicate keys do not inflate the estimate") {
    val dup = spark.range(0, 3000).select(
      concat(lit("k"), (col("id") % 300)).as("key"))
    val r = Cardinality.kmvDistinct(dup, col("key"), 512).head()
    assert(r.getAs[Int]("k_used") == 300)
    assert(r.getAs[Double]("est") == 300.0)
  }
}

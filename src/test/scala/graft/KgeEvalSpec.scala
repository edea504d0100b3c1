package graft

import graft.operators.KgeEval

/** TransE filtered-rank evaluation against hand-computed ranks. */
class KgeEvalSpec extends SparkSpec {

  import spark.implicits._

  // r = (0,0) so dist(h,t) = ||h - t||²:
  //   a=(0,0), b=(1,0), c=(2,0), d=(0,3)
  private lazy val ent = Seq(
    ("a", Seq(0f, 0f)), ("b", Seq(1f, 0f)),
    ("c", Seq(2f, 0f)), ("d", Seq(0f, 3f))
  ).toDF("node", "vec")
  private lazy val rel = Seq(("r", Seq(0f, 0f))).toDF("rel", "vec")

  test("filtered tail ranks match hand computation") {
    // vocabulary for r: {b, c, d}; from head a: dist b=1, c=4, d=9
    val all = Seq(("a", "r", "c"), ("a", "r", "d"), ("c", "r", "b"))
      .toDF("h", "r", "t")
    // evaluate (a,r,d): unfiltered it would rank 3rd (b=1, c=4 < 9) but
    // the true triple (a,r,c) is FILTERED OUT, leaving only b → rank 2
    val test = Seq(("a", "r", "d")).toDF("h", "r", "t")
    val got = KgeEval.tailRanks(test, all, ent, rel)
      .select("h", "t", "rank").as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("a", "d", 2L)))
  }

  test("filtered head ranks mirror the protocol on the head side") {
    // heads scored against t=a (r=0): b=1, c=4, d=9
    val all2 = Seq(("c", "r", "a"), ("d", "r", "a"), ("b", "r", "b"))
      .toDF("h", "r", "t")
    // evaluate (d,r,a): head vocab {b,c,d}; unfiltered b=1,c=4 < 9 → 3rd;
    // filtered removes the true (c,r,a), leaving b → rank 2
    val test = Seq(("d", "r", "a")).toDF("h", "r", "t")
    val got = KgeEval.headRanks(test, all2, ent, rel)
      .select("h", "rank").as[(String, Long)].collect().toSeq
    assert(got === Seq(("d", 2L)))
  }

  test("DistMult ranks: higher trilinear score is better, same filtering") {
    // r = (1,1) so score(h,t) = h·t (elementwise through r=1):
    //   from head h=(1,2): t b=(1,0)→1, c=(2,0)→2, d=(0,3)→6
    val entD = Seq(
      ("h", Seq(1f, 2f)), ("b", Seq(1f, 0f)),
      ("c", Seq(2f, 0f)), ("d", Seq(0f, 3f))
    ).toDF("node", "vec")
    val relD = Seq(("r", Seq(1f, 1f))).toDF("rel", "vec")
    val all = Seq(("h", "r", "b"), ("h", "r", "d"), ("c", "r", "c"))
      .toDF("h", "r", "t")
    // evaluate (h,r,b): score 1; unfiltered d(6) and c(2) beat it → rank 3;
    // filtering removes the TRUE (h,r,d), leaving c → rank 2
    val test = Seq(("h", "r", "b")).toDF("h", "r", "t")
    val got = KgeEval.distMultTailRanks(test, all, entD, relD)
      .select("h", "t", "rank").as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("h", "b", 2L)))
    // head side: candidates {h, c} scored against t=d=(0,3): h→6, c→0;
    // evaluating (c,r,c) is not in vocab... use (h,r,d) itself: rank 1
    val got2 = KgeEval.distMultHeadRanks(
      Seq(("h", "r", "d")).toDF("h", "r", "t"), all, entD, relD)
      .select("rank").as[Long].collect().toSeq
    assert(got2 === Seq(1L))
  }

  test("tie ranks break on candidate ordering; metrics aggregate") {
    // head a, tails b and bb at the SAME embedding distance
    val ent2 = ent.unionAll(Seq(("bb", Seq(1f, 0f))).toDF("node", "vec"))
    val all = Seq(("a", "r", "b"), ("c", "r", "bb")).toDF("h", "r", "t")
    val test = Seq(("a", "r", "b")).toDF("h", "r", "t")
    // candidates {b, bb}: dist equal; tie-break counts cand < t — "bb" > "b"
    // is false... "bb" < "b" lexicographically? "b" < "bb", so bb does NOT
    // count; rank 1
    val got = KgeEval.tailRanks(test, all, ent2, rel)
      .select("rank").as[Long].collect().toSeq
    assert(got === Seq(1L))
    val m = KgeEval.metrics(KgeEval.tailRanks(test, all, ent2, rel)).collect()(0)
    assert(m.getAs[Long]("n") === 1L)
    assert(math.abs(m.getAs[Double]("mrr") - 1.0) < 1e-12)
    assert(m.getAs[Double]("hits_at_1") === 1.0)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Cooccur

/** Co-occurrence edge construction: pair counts, true marginals, the
  * group-size census cap (the quadratic-fanout guard) and its audit
  * surface, within-group dedup, and canonical pair ordering.
  */
class CooccurSpec extends SparkSpec {

  import spark.implicits._

  // g1 {a,b,c}, g2 {a,b}, g3 {a}, g4 = a hot group with 12 items
  private lazy val facts = (
    Seq(("g1", "a"), ("g1", "b"), ("g1", "c"), ("g1", "b"), // dup (g1,b)
        ("g2", "a"), ("g2", "b"), ("g3", "a")) ++
    (0 until 12).map(i => ("g4", f"h$i%02d"))
  ).toDF("grp", "itm")

  private def collectEdges(maxGroupSize: Int = 1000) =
    Cooccur.edges(facts, col("grp"), col("itm"), minBoth = 1L, maxGroupSize)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("edges: counted pairs with true marginals, duplicates collapsed") {
    val e = collectEdges()
    // (a,b) co-occur in g1+g2 despite the duplicated (g1,b) fact
    assert(e(("a", "b")) == ((2L, 3L, 2L)))
    assert(e(("a", "c")) == ((1L, 3L, 1L)))
    assert(e(("b", "c")) == ((1L, 2L, 1L)))
    // canonical ordering: no (b, a) mirror rows
    assert(!e.contains(("b", "a")))
  }

  test("edges: the census cap excludes hot groups from pairing only") {
    val capped = collectEdges(maxGroupSize = 10)
    // g4's 66 pairs are gone, g1/g2's survive
    assert(capped.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val uncapped = collectEdges(maxGroupSize = 12)
    assert(uncapped.size == 3 + 66)
    // marginals stay cap-independent: a appears in 3 groups either way
    assert(capped(("a", "b"))._2 == 3L && uncapped(("a", "b"))._2 == 3L)
  }

  test("oversized: the excluded groups are auditable, not vanished") {
    val o = Cooccur.oversized(facts, col("grp"), col("itm"), maxGroupSize = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(o == Map("g4" -> 12L))
    assert(Cooccur.oversized(facts, col("grp"), col("itm"), 12).count() == 0)
  }

  test("edges: minBoth filters by support") {
    val e = Cooccur.edges(facts, col("grp"), col("itm"), minBoth = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(e == Set(("a", "b")))
  }
}

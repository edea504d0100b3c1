package graft

import org.apache.spark.sql.functions._

import graft.operators.Linking

/** Blocked fuzzy surface matching: Levenshtein verify, the stated
  * blocking recall trade, the length-band guard, case folding, and the
  * block census cap.
  */
class FuzzyPairsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val surfaces = Seq(
    "Acme Corp", "acme corp.",     // dist 1 after lowering, same block "ac"
    "acme korp",                   // dist 2 of "acme corp"
    "emca corp",                   // same letters, different block "em"
    "acme corporation intl",       // length band excludes vs "acme corp"
    "zeta", "zeta!", "zetaxx"      // block "ze": dists 1 and 2
  ).toDF("surface")

  private def pairs(maxDist: Int = 2, cap: Int = 10000) =
    Linking.fuzzyPairs(surfaces, maxDist, prefixLen = 2, blockCap = cap)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap

  test("fuzzyPairs: verified pairs with distances, canonical order") {
    val p = pairs()
    assert(p(("acme corp", "acme corp.")) == 1)
    assert(p(("acme corp", "acme korp")) == 1)
    assert(p(("acme corp.", "acme korp")) == 2)
    assert(p(("zeta", "zeta!")) == 1)
    assert(p(("zeta", "zetaxx")) == 2)
    assert(p(("zeta!", "zetaxx")) == 2)
    assert(p.size == 6)
    assert(p.keys.forall { case (a, b) => a < b })
  }

  test("fuzzyPairs: blocking miss and length band are the stated trades") {
    val p = pairs()
    // different prefix block: never considered even though dist is small
    assert(!p.contains(("acme corp", "emca corp")))
    // |len diff| > maxDist: pruned before any levenshtein
    assert(p.keys.forall { case (a, b) =>
      math.abs(a.length - b.length) <= 2 })
  }

  test("fuzzyPairs: census cap drops hot blocks from pairing only") {
    // cap below the "ac" block size (4 surfaces): its pairs vanish,
    // the "ze" block (3) survives
    val p = pairs(cap = 3)
    assert(p.keySet == Set(("zeta", "zeta!"), ("zeta", "zetaxx"),
      ("zeta!", "zetaxx")))
  }

  test("oversizedBlocks: the dropped blocks are auditable, not vanished") {
    val o = Linking.oversizedBlocks(surfaces, prefixLen = 2, blockCap = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(o == Map("ac" -> 4L))
    assert(Linking.oversizedBlocks(surfaces, 2, 10).count() == 0)
  }
}

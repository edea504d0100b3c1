package graft

import graft.operators.KgStats

/** KG profiling statistics against hand-counted fixtures. */
class KgStatsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val tri = Seq(
    ("c1", "in_nation", "de"), ("c1", "age", "31"), ("c1", "age", "32"),
    ("c2", "in_nation", "de"),
    ("c3", "age", "40"),
    ("n1", "in_region", "eu")
  ).toDF("subj", "pred", "obj")

  test("characteristic sets: sorted shapes with subject counts") {
    val got = KgStats.characteristicSets(tri).as[(String, Long)]
      .collect().toMap
    // c1 {age, in_nation}; c2 {in_nation}; c3 {age}; n1 {in_region};
    // the duplicate (c1, age) pair collapses before shaping
    assert(got === Map(
      "age in_nation" -> 1L, "in_nation" -> 1L,
      "age" -> 1L, "in_region" -> 1L))
  }

  test("predicate stats: triples, distinct subjects, distinct objects") {
    val got = KgStats.predicateStats(tri)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      "in_nation" -> ((2L, 2L, 1L)),
      "age" -> ((3L, 2L, 3L)),
      "in_region" -> ((1L, 1L, 1L))))
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Fusion

/** Knowledge fusion: the support → recency → lexicographic rule, its
  * determinism, and the carried provenance.
  */
class FusionSpec extends SparkSpec {

  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  private lazy val obs = Seq(
    // u1: berlin observed twice, bonn once -> support wins
    ("u1", "loc", "berlin", ts(1)), ("u1", "loc", "berlin", ts(2)),
    ("u1", "loc", "bonn", ts(9)),
    // u2: support tie 1-1 -> the later observation wins
    ("u2", "loc", "old", ts(1)), ("u2", "loc", "new", ts(5)),
    // u3: support AND recency tie -> lexicographically smaller obj
    ("u3", "loc", "zeta", ts(4)), ("u3", "loc", "alpha", ts(4)),
    // u4: single observation passes through
    ("u4", "loc", "kiel", ts(7)),
    // null evidence is dropped, not fused
    ("u5", "loc", null.asInstanceOf[String], ts(1))
  ).toDF("subj", "pred", "obj", "ts")

  test("resolve: support desc, then last_seen desc, then obj asc") {
    val r = Fusion.resolve(obs).collect()
      .map(x => x.getString(0) -> ((x.getString(2), x.getLong(3),
        x.getTimestamp(4), x.getTimestamp(5), x.getLong(6)))).toMap
    assert(r("u1") == (("berlin", 2L, ts(1), ts(2), 2L)))
    assert(r("u2") == (("new", 1L, ts(5), ts(5), 2L)))
    assert(r("u3") == (("alpha", 1L, ts(4), ts(4), 2L)))
    assert(r("u4") == (("kiel", 1L, ts(7), ts(7), 1L)))
    assert(!r.contains("u5"))
  }

  test("resolve: a pure function of the observation SET, not its layout") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Fusion.resolve(df).collect()
        .map(x => (x.getString(0), x.getString(2), x.getLong(3))).toSet
    assert(run(obs) == run(obs.repartition(7, col("obj"))))
    assert(run(obs) == run(obs.orderBy(col("ts").desc)))
  }

  test("resolve: one row per (subj, pred), exactly") {
    val r = Fusion.resolve(obs)
    assert(r.groupBy("subj", "pred").count().filter(col("count") > 1).count() == 0)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Constraints

/** SHACL-lite triple constraints: functional fan-out detection (set
  * semantics, null handling, unconstrained preds ignored) and range
  * quarantine (anti-join semantics, null objects are violations).
  */
class ConstraintsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val triples = Seq(
    ("c1", "lang", "en"), ("c1", "lang", "en"),      // exact dup: not a violation
    ("c2", "lang", "en"), ("c2", "lang", "de"),      // fan-out: violation
    ("c3", "lang", null.asInstanceOf[String]),       // null doesn't fan out
    ("c3", "lang", "fr"),
    ("c4", "org", "acme"), ("c4", "org", "globex"),  // unconstrained pred
    ("c5", "sector", "it"), ("c5", "sector", "farm") // second functional pred
  ).toDF("subj", "pred", "obj")

  test("functionalViolations: distinct fan-out only, per declared pred") {
    val v = Constraints.functionalViolations(triples, Seq("lang", "sector"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(v == Map(("c2", "lang") -> 2L, ("c5", "sector") -> 2L))
    intercept[IllegalArgumentException](
      Constraints.functionalViolations(triples, Nil))
  }

  test("rangeViolations: out-of-dim and null objects are quarantined") {
    val dim = Seq("en", "fr").toDF("value")
    val v = Constraints.rangeViolations(triples, "lang", dim)
      .collect().map(r => (r.getString(0), Option(r.getString(2)))).toSet
    // de is out of range; the null object is a violation; en/fr pass;
    // other predicates are untouched
    assert(v == Set(("c2", Some("de")), ("c3", None)))
  }

  test("rangeViolations: a null or duplicated dim row never absolves") {
    val dirty = Seq("en", "en", null.asInstanceOf[String]).toDF("value")
    val v = Constraints.rangeViolations(triples, "lang", dirty)
      .collect().map(r => Option(r.getString(2))).toSet
    assert(v == Set(Some("de"), Some("fr"), None))
  }

  test("cardinalityViolations: zero-count min, over-max, in-range absent") {
    val tri = Seq(
      ("c1", "lang", "en"),
      ("c2", "lang", "en"), ("c2", "lang", "fr"), ("c2", "lang", "de"),
      ("c3", "other", "x") // no lang triples at all
    ).toDF("subj", "pred", "obj")
    val scope = Seq("c1", "c2", "c3").toDF("id")
    val got = Constraints.cardinalityViolations(tri, scope,
        Seq(("lang", 1, 2)))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3))).toSet
    // c1 has 1 (in range, absent); c2 has 3 (max); c3 has 0 (min)
    assert(got === Set(("c2", 3L, "max"), ("c3", 0L, "min")))
    intercept[IllegalArgumentException](
      Constraints.cardinalityViolations(tri, scope, Seq(("lang", 2, 1))))
  }

  test("datatypeViolations: integer and double parses, nulls flagged") {
    val tri = Seq(
      ("a", "n", "42"), ("b", "n", "-7"), ("c", "n", "12.5"),
      ("d", "n", "abc"), ("e", "n", null.asInstanceOf[String]),
      ("f", "n", "1e3"), ("g", "other", "zzz")
    ).toDF("subj", "pred", "obj")
    val ints = Constraints.datatypeViolations(tri, "n", "integer")
      .collect().map(_.getString(0)).toSet
    assert(ints === Set("c", "d", "e", "f"))
    val dbls = Constraints.datatypeViolations(tri, "n", "double")
      .collect().map(_.getString(0)).toSet
    assert(dbls === Set("d", "e"))
    intercept[IllegalArgumentException](
      Constraints.datatypeViolations(tri, "n", "date"))
  }
}

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
}

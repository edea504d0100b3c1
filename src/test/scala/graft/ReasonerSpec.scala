package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Reasoner

/** RDFS-lite entailment against a hand-computed fixpoint: property
  * inheritance up a 2-link subPropertyOf chain, domain/range firing on
  * INHERITED triples, type propagation up subClassOf, dedupe of
  * entailments already asserted, and no-schema passthrough.
  */
class ReasonerSpec extends SparkSpec {

  import spark.implicits._

  private def rows(df: DataFrame): Set[(String, String, String)] =
    df.as[(String, String, String)].collect().toSet

  test("rdfs closure matches the hand-computed fixpoint") {
    val schema = Seq(
      ("p", "subPropertyOf", "q"), ("q", "subPropertyOf", "r"),
      ("q", "domain", "C"), ("r", "range", "D"),
      ("C", "subClassOf", "E"), ("E", "subClassOf", "F"),
      ("D", "subClassOf", "F")
    ).toDF("subj", "pred", "obj")
    val data = Seq(
      ("s", "p", "o"),
      ("s", "q", "o"), // already asserted — the rdfs7 entailment must dedupe
      ("u", "r", "v"),
      ("x", "type", "C")
    ).toDF("subj", "pred", "obj")
    val got = rows(Reasoner.rdfsClosure(data, schema))
    val want = Set(
      ("s", "p", "o"), ("s", "q", "o"), ("s", "r", "o"), ("u", "r", "v"),
      // domain of q fires on (s,q,o); range of r on (s,r,o) AND (u,r,v)
      ("s", "type", "C"), ("o", "type", "D"), ("v", "type", "D"),
      ("x", "type", "C"),
      // rdfs9 up C⊑E⊑F and D⊑F
      ("s", "type", "E"), ("s", "type", "F"),
      ("x", "type", "E"), ("x", "type", "F"),
      ("o", "type", "F"), ("v", "type", "F"))
    assert(got === want)
  }

  test("no schema: data passes through as a set") {
    val data = Seq(("a", "p", "b"), ("a", "p", "b"), ("x", "type", "T"))
      .toDF("subj", "pred", "obj")
    val empty = Seq.empty[(String, String, String)].toDF("subj", "pred", "obj")
    assert(rows(Reasoner.rdfsClosure(data, empty)) ===
      Set(("a", "p", "b"), ("x", "type", "T")))
  }

  test("custom type predicate name is honored") {
    val schema = Seq(("C", "subClassOf", "D")).toDF("subj", "pred", "obj")
    val data = Seq(("x", "a", "C")).toDF("subj", "pred", "obj")
    val got = rows(Reasoner.rdfsClosure(data, schema, typePred = "a"))
    assert(got === Set(("x", "a", "C"), ("x", "a", "D")))
  }
}

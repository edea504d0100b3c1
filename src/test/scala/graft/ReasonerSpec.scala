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

  test("owl inverseOf and TransitiveProperty entail through the pass order") {
    val schema = Seq(
      ("placed", "inverseOf", "placed_by"),
      ("within", "type", "TransitiveProperty"),
      ("within", "subPropertyOf", "located"),
      ("located", "type", "TransitiveProperty")
    ).toDF("subj", "pred", "obj")
    val data = Seq(
      ("c1", "placed", "o1"),
      ("o9", "placed_by", "c2"), // inverse declared the other way round
      ("a", "within", "b"), ("b", "within", "c"), ("c", "within", "d")
    ).toDF("subj", "pred", "obj")
    val got = rows(Reasoner.rdfsClosure(data, schema))
    val within = Set(("a", "b"), ("b", "c"), ("c", "d"),
      ("a", "c"), ("b", "d"), ("a", "d"))
    val want =
      Set(("c1", "placed", "o1"), ("o1", "placed_by", "c1"),
        ("o9", "placed_by", "c2"), ("c2", "placed", "o9")) ++
      within.map { case (s, o) => (s, "within", o) } ++
      // located inherits within's DIRECT pairs then closes itself — same
      // six pairs here, proving the transitive super-property closes
      // over inherited pairs
      within.map { case (s, o) => (s, "located", o) }
    assert(got === want)
  }

  test("owl SymmetricProperty: both directions, before inherit and close") {
    val schema = Seq(
      ("adj", "type", "SymmetricProperty"),
      ("adj", "subPropertyOf", "near"),
      ("conn", "type", "SymmetricProperty"),
      ("conn", "type", "TransitiveProperty")
    ).toDF("subj", "pred", "obj")
    val data = Seq(
      ("a", "adj", "b"),
      ("x", "conn", "y"), ("y", "conn", "z")
    ).toDF("subj", "pred", "obj")
    val got = rows(Reasoner.rdfsClosure(data, schema))
    // symmetry fires, then rdfs7 inherits BOTH directions into near
    assert(got.contains(("b", "adj", "a")))
    assert(got.contains(("a", "near", "b")) && got.contains(("b", "near", "a")))
    // symmetric + transitive = the whole component pairs up (incl. selfs
    // via x→y→x) — symmetry must fire BEFORE the transitive close
    for (u <- Seq("x", "y", "z"); v <- Seq("x", "y", "z"))
      assert(got.contains((u, "conn", v)), s"missing ($u conn $v)")
    // a triple that becomes an instance of a symmetric SUPER-property
    // via rdfs7 must flip too, and the flip inherits onward (sub ⊑ q ⊑ r,
    // q symmetric): (a sub b) ⊢ (a q b), (b q a), (a r b), (b r a)
    val schema2 = Seq(
      ("sub", "subPropertyOf", "q"), ("q", "subPropertyOf", "r"),
      ("q", "type", "SymmetricProperty")
    ).toDF("subj", "pred", "obj")
    val got2 = rows(Reasoner.rdfsClosure(
      Seq(("a", "sub", "b")).toDF("subj", "pred", "obj"), schema2))
    assert(got2 === Set(
      ("a", "sub", "b"), ("a", "q", "b"), ("b", "q", "a"),
      ("a", "r", "b"), ("b", "r", "a")))
  }

  test("equivalentClass/equivalentProperty expand to mutual subsumption") {
    val schema = Seq(
      ("Person", "equivalentClass", "Human"),
      ("Human", "subClassOf", "Agent"),
      ("hires", "equivalentProperty", "employs"),
      ("employs", "subPropertyOf", "engages")
    ).toDF("subj", "pred", "obj")
    val data = Seq(
      ("x", "type", "Person"),
      ("y", "type", "Human"),
      ("acme", "hires", "bob"),
      ("corp", "employs", "eve")
    ).toDF("subj", "pred", "obj")
    val got = rows(Reasoner.rdfsClosure(data, schema))
    // equivalence both ways: Person-typed gets Human (and up to Agent),
    // Human-typed gets Person; hires↔employs mutually entail, both
    // inherit up to engages through the MIXED chain
    assert(got === Set(
      ("x", "type", "Person"), ("x", "type", "Human"), ("x", "type", "Agent"),
      ("y", "type", "Human"), ("y", "type", "Person"), ("y", "type", "Agent"),
      ("acme", "hires", "bob"), ("acme", "employs", "bob"),
      ("acme", "engages", "bob"),
      ("corp", "employs", "eve"), ("corp", "hires", "eve"),
      ("corp", "engages", "eve")))
  }

  test("FunctionalProperty / InverseFunctionalProperty derive sameAs links") {
    val schema = Seq(
      ("hq_city", "type", "FunctionalProperty"),
      ("email", "type", "InverseFunctionalProperty")
    ).toDF("subj", "pred", "obj")
    val data = Seq(
      // functional: acme's two asserted HQs are the same city
      ("acme", "hq_city", "muc"), ("acme", "hq_city", "munich"),
      ("acme", "hq_city", "muc"),            // duplicate — no self-link
      ("globex", "hq_city", "berlin"),       // singleton — no link
      // inverse-functional: two subjects sharing an email merge
      ("p1", "email", "a@x"), ("p2", "email", "a@x"), ("p3", "email", "a@x"),
      ("p9", "email", "z@x"),
      // a NON-declared predicate with shared objects must not fire
      ("p1", "likes", "pizza"), ("p2", "likes", "pizza")
    ).toDF("subj", "pred", "obj")
    val got = rows(Reasoner.functionalSameAs(data, schema))
    assert(got === Set(
      ("muc", "sameAs", "munich"),
      ("p1", "sameAs", "p2"), ("p1", "sameAs", "p3")))
    // composes: detected links + the smusher collapse the aliases
    val smushed = rows(Reasoner.smushSameAs(
      data.unionAll(got.toSeq.toDF("subj", "pred", "obj"))))
    assert(smushed.contains(("acme", "hq_city", "muc")))
    assert(!smushed.exists(_._3 == "munich"))
    assert(smushed.filter(_._2 == "email").map(_._1) === Set("p1", "p9"))
  }

  test("functional sameAs feeds smush feeds entailment (detect→smush→entail)") {
    val schema = Seq(
      ("ceo_of", "type", "InverseFunctionalProperty"),
      ("ceo_of", "domain", "Person"),
      ("Person", "subClassOf", "Agent")
    ).toDF("subj", "pred", "obj")
    val data = Seq(
      ("bob", "ceo_of", "acme"), ("robert", "ceo_of", "acme"),
      ("robert", "age", "55")
    ).toDF("subj", "pred", "obj")
    val links = Reasoner.functionalSameAs(data, schema)
    assert(rows(links) === Set(("bob", "sameAs", "robert")))
    val smushed = Reasoner.smushSameAs(data.unionAll(links))
    val entailed = rows(Reasoner.rdfsClosure(smushed, schema))
    // one canonical node carries BOTH facts and the domain-derived types
    assert(entailed === Set(
      ("bob", "ceo_of", "acme"), ("bob", "age", "55"),
      ("bob", "type", "Person"), ("bob", "type", "Agent")))
  }

  test("sameAs smushing: chains collapse, duplicates merge, links consumed") {
    val data = Seq(
      ("b9", "sameAs", "a9"), ("a9", "sameAs", "c9"), // chain b9-a9-c9
      ("c9", "works_at", "orgX"), ("b9", "works_at", "orgX"), // dup under alias
      ("a9", "knows", "u1"),
      ("u2", "knows", "c9"), // object-side rewrite
      ("z1", "knows", "z2") // untouched by any link
    ).toDF("subj", "pred", "obj")
    val got = rows(Reasoner.smushSameAs(data))
    assert(got === Set(
      ("a9", "works_at", "orgX"), // min of {a9,b9,c9} — one row, not two
      ("a9", "knows", "u1"),
      ("u2", "knows", "a9"),
      ("z1", "knows", "z2")))
  }

  test("sameAs smushing: unconverged long chain throws loudly") {
    val chain = (0 until 12).map(i => (f"n$i%02d", "sameAs", f"n${i + 1}%02d"))
    val data = (chain :+ (("n00", "p", "v"))).toDF("subj", "pred", "obj")
    intercept[IllegalStateException] {
      Reasoner.smushSameAs(data, maxIter = 2)
    }
    // and with the budget it converges to the chain min
    assert(rows(Reasoner.smushSameAs(data, maxIter = 13)) ===
      Set(("n00", "p", "v")))
  }
}

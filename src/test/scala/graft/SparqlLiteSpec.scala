package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{GraphQuery, SparqlLite}
import graft.operators.GraphQuery.TriplePattern

/** The SPARQL-lite front-end: text == programmatic-API equivalence, every
  * clause (DISTINCT, OPTIONAL, FILTER, VALUES, LIMIT, star), tokenizer
  * corners, and loud rejection of malformed queries.
  */
class SparqlLiteSpec extends SparkSpec {

  import spark.implicits._

  private lazy val tri: DataFrame = Seq(
    ("c1", "in_nation", "de"), ("c2", "in_nation", "de"),
    ("c3", "in_nation", "fr"), ("c4", "in_nation", "fr"),
    ("de", "in_region", "europe"), ("fr", "in_region", "europe"),
    ("c1", "age", "31"), ("c2", "age", "9"), ("c3", "age", "40"),
    ("o1", "ordered_by", "c1"), ("o2", "ordered_by", "c1")
  ).toDF("subj", "pred", "obj").cache()

  private def rows(df: DataFrame): Set[Seq[String]] =
    df.collect().map(_.toSeq.map(v => if (v == null) null else v.toString)).toSet

  test("query text plans identically to the programmatic API") {
    val text = SparqlLite.sparql(tri,
      "SELECT ?c ?n WHERE { ?c in_nation ?n . ?n in_region europe }")
    val api = GraphQuery.bgpMatch(tri, Seq(
      TriplePattern("?c", "in_nation", "?n"),
      TriplePattern("?n", "in_region", "europe")))
      .select("c", "n")
    assert(text.columns.toSeq === api.columns.toSeq)
    assert(rows(text) === rows(api))
    assert(rows(text).size === 4)
  }

  test("OPTIONAL group left-joins; unmatched rows keep null bindings") {
    val got = SparqlLite.sparql(tri,
      """SELECT ?c ?o WHERE {
        |  ?c in_nation ?n .
        |  OPTIONAL { ?o ordered_by ?c }
        |}""".stripMargin)
    assert(rows(got) === Set(Seq("c1", "o1"), Seq("c1", "o2"),
      Seq("c2", null), Seq("c3", null), Seq("c4", null)))
  }

  test("FILTER: string inequality on a binding, numeric compare vs a literal") {
    val ne = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c in_nation ?n . FILTER ( ?n != de ) }")
    assert(rows(ne) === Set(Seq("c3"), Seq("c4")))
    // numeric: lexically '9' > '31' but numerically 9 < 31
    val num = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a . FILTER ( ?a >= 31 ) }")
    assert(rows(num) === Set(Seq("c1"), Seq("c3")))
    // fractional literal: the tokenizer splits at '.', the parser re-fuses
    val frac = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a . FILTER ( ?a > 31.5 ) }")
    assert(rows(frac) === Set(Seq("c3")))
  }

  test("VALUES restricts a binding; quoted and <iri> terms tokenize") {
    val got = SparqlLite.sparql(tri,
      """SELECT ?c WHERE {
        |  ?c <in_nation> ?n . VALUES ?n { 'de' }
        |}""".stripMargin)
    assert(rows(got) === Set(Seq("c1"), Seq("c2")))
  }

  test("DISTINCT, SELECT *, LIMIT, comments") {
    val d = SparqlLite.sparql(tri,
      "SELECT DISTINCT ?n WHERE { ?c in_nation ?n } # trailing comment")
    assert(rows(d) === Set(Seq("de"), Seq("fr")))
    val star = SparqlLite.sparql(tri,
      "SELECT * WHERE { ?c in_nation ?n . ?n in_region ?r }")
    assert(star.columns.toSeq === Seq("c", "n", "r"))
    assert(SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c in_nation de . } LIMIT 1").count() === 1)
  }

  test("aggregates: GROUP BY count/min, global count, null-skipping COUNT") {
    val perN = SparqlLite.sparql(tri,
      """SELECT ?n (COUNT(?c) AS ?cnt) (MIN(?c) AS ?first)
        |WHERE { ?c in_nation ?n } GROUP BY ?n""".stripMargin)
    assert(perN.columns.toSeq === Seq("n", "cnt", "first"))
    assert(rows(perN) === Set(Seq("de", "2", "c1"), Seq("fr", "2", "c3")))
    val global = SparqlLite.sparql(tri,
      "SELECT (COUNT(*) AS ?total) WHERE { ?c in_nation ?n }")
    assert(rows(global) === Set(Seq("4")))
    // COUNT(?o) skips the null bindings an OPTIONAL leaves behind
    val nullSkip = SparqlLite.sparql(tri,
      """SELECT ?n (COUNT(?o) AS ?orders) WHERE {
        |  ?c in_nation ?n . OPTIONAL { ?o ordered_by ?c }
        |} GROUP BY ?n""".stripMargin)
    assert(rows(nullSkip) === Set(Seq("de", "2"), Seq("fr", "0")))
    val sumAge = SparqlLite.sparql(tri,
      "SELECT (SUM(?a) AS ?s) WHERE { ?c age ?a }")
    assert(rows(sumAge) === Set(Seq("80.0")))
  }

  test("aggregate validation: bare var needs GROUP BY, star cannot mix") {
    def bad(q: String): Unit =
      intercept[IllegalArgumentException](SparqlLite.sparql(tri, q))
    bad("SELECT ?c (COUNT(?n) AS ?x) WHERE { ?c in_nation ?n }")
    bad("SELECT * (COUNT(?n) AS ?x) WHERE { ?c in_nation ?n }")
    bad("SELECT ?c WHERE { ?c in_nation ?n } GROUP BY ?c")
    bad("SELECT (SUM(*) AS ?x) WHERE { ?c in_nation ?n }")
    bad("SELECT (COUNT(?z) AS ?x) WHERE { ?c in_nation ?n }")
  }

  test("property paths in the predicate position: ^, /, |, bounded +") {
    // orders up through both containment levels, via the text syntax
    val tri2 = tri.unionAll(Seq(("c1", "placed", "o1"), ("c3", "placed", "o3"))
      .toDF("subj", "pred", "obj"))
    val got = SparqlLite.sparql(tri2,
      "SELECT ?o ?x WHERE { ?o ^placed/(in_nation|in_region)+3 ?x }")
    assert(rows(got) === Set(
      Seq("o1", "de"), Seq("o1", "europe"),
      Seq("o3", "fr"), Seq("o3", "europe")))
    // a path frame joins plain patterns on shared variables
    val joined = SparqlLite.sparql(tri2,
      """SELECT ?c ?r WHERE {
        |  ?c (in_nation/in_region) ?r . ?c placed ?o
        |}""".stripMargin)
    assert(rows(joined) === Set(Seq("c1", "europe"), Seq("c3", "europe")))
    // constant endpoint filters the pair set
    val const = SparqlLite.sparql(tri2,
      "SELECT ?c WHERE { ?c in_nation|in_region europe }")
    assert(rows(const) === Set(Seq("de"), Seq("fr")))
    def bad(q: String): Unit =
      intercept[IllegalArgumentException](SparqlLite.sparql(tri2, q))
    bad("SELECT ?c WHERE { ?c in_nation+* ?n }")        // unbounded *
    bad("SELECT ?c WHERE { ?c (in_nation ?n }")          // unbalanced
    // paths are legal in nested groups since round 4; a malformed one
    // still fails loudly
    bad("SELECT ?c WHERE { ?c in_nation ?n . OPTIONAL { ?c (a+ ?z } }")
  }

  test("PREFIX declarations expand prefixed names everywhere") {
    val iri = Seq(
      ("c1", "http://ex.org/in_nation", "de"),
      ("c2", "http://ex.org/in_nation", "fr"),
      ("de", "http://ex.org/in_region", "europe")
    ).toDF("subj", "pred", "obj")
    val got = SparqlLite.sparql(iri,
      """PREFIX ex: <http://ex.org/>
        |SELECT ?c ?r WHERE { ?c ex:in_nation/ex:in_region ?r }""".stripMargin)
    assert(rows(got) === Set(Seq("c1", "europe")),
      "prefixed names must expand inside path expressions too")
    val plain = SparqlLite.sparql(iri,
      """PREFIX ex: <http://ex.org/>
        |SELECT ?c WHERE { ?c ex:in_nation de }""".stripMargin)
    assert(rows(plain) === Set(Seq("c1")))
    // an UNDECLARED prefix stays verbatim (terms match table values)
    val verbatim = SparqlLite.sparql(iri,
      "SELECT ?c WHERE { ?c other:in_nation ?n }")
    assert(verbatim.count() === 0)
    // a BRACKETED IRI predicate is literal even though it contains '/'
    // (path-ness is raw syntax, decided at parse — round-4 fix)
    val bracketed = SparqlLite.sparql(iri,
      "SELECT ?c WHERE { ?c <http://ex.org/in_nation> de }")
    assert(rows(bracketed) === Set(Seq("c1")))
    intercept[IllegalArgumentException](SparqlLite.sparql(iri,
      "PREFIX ex <http://ex.org/> SELECT ?c WHERE { ?c ex:p ?n }"))
  }

  test("property paths inside UNION / OPTIONAL / MINUS / EXISTS groups") {
    val tri2 = tri.unionAll(Seq(("c1", "placed", "o1"))
      .toDF("subj", "pred", "obj"))
    // UNION branch mixing a path with a plain branch
    val u = SparqlLite.sparql(tri2,
      """SELECT ?c ?x WHERE {
        |  { ?c in_nation/in_region ?x } UNION { ?c placed ?x }
        |}""".stripMargin)
    assert(rows(u) === Set(Seq("c1", "europe"), Seq("c2", "europe"),
      Seq("c3", "europe"), Seq("c4", "europe"), Seq("c1", "o1")))
    // OPTIONAL with a two-hop path: unmatched keeps null
    val o = SparqlLite.sparql(tri2,
      """SELECT DISTINCT ?c ?r WHERE { ?c in_nation ?n .
        |  OPTIONAL { ?c in_nation/in_region ?r } }""".stripMargin)
    assert(rows(o) === Set(Seq("c1", "europe"), Seq("c2", "europe"),
      Seq("c3", "europe"), Seq("c4", "europe")))
    // NOT EXISTS over a path: who CANNOT reach europe two hops out?
    val ne = SparqlLite.sparql(tri2,
      """SELECT ?o WHERE { ?o ordered_by ?c .
        |  FILTER NOT EXISTS { ?o ordered_by/in_nation ?n } }""".stripMargin)
    assert(rows(ne) === Set.empty)
  }

  test("negated property sets: !p and !(p1|p2)") {
    val single = SparqlLite.sparql(tri,
      "SELECT ?a ?b WHERE { ?a !in_nation ?b }")
    val expected = tri.filter($"pred" =!= "in_nation")
      .select("subj", "obj").as[(String, String)].collect()
      .map { case (a, b) => Seq(a, b) }.toSet
    assert(rows(single) === expected)
    val set = SparqlLite.sparql(tri,
      "SELECT ?a ?b WHERE { ?a !(in_nation|age|ordered_by) ?b }")
    assert(rows(set) === Set(Seq("de", "europe"), Seq("fr", "europe")))
    // inverse members (SPARQL 1.1 §9.1): a mixed set unions the
    // forward part (pred ∉ forward members) with the REVERSED part
    // (pred ∉ inverse members); here seeded at the constant europe —
    // no forward edges leave europe, the reversed in_region pair
    // survives the ^ordered_by exclusion
    val mixed = SparqlLite.sparql(tri,
      "SELECT ?x WHERE { europe !(in_nation|^ordered_by) ?x }")
    assert(rows(mixed) === Set(Seq("de"), Seq("fr")))
    // inverse-only set: reversed links not labeled in_region — c1's
    // incoming ordered_by edges, reversed
    val invOnly = SparqlLite.sparql(tri,
      "SELECT ?x WHERE { c1 !^in_region ?x }")
    assert(rows(invOnly) === Set(Seq("o1"), Seq("o2")))
    // composes: anything-but-age, then a region hop
    val chained = SparqlLite.sparql(tri,
      "SELECT ?a WHERE { ?a !(age|ordered_by)/in_region ?r }")
    assert(rows(chained) === Set(Seq("c1"), Seq("c2"), Seq("c3"), Seq("c4")))
  }

  test("session stats cache: N queries against one table pay ONE stats job") {
    SparqlLite.clearStatsCache()
    val before = GraphQuery.BgpStats.computeCount.get()
    (1 to 3).foreach { _ =>
      SparqlLite.sparql(tri,
        "SELECT ?c ?n WHERE { ?c in_nation ?n . ?n in_region europe }").count()
    }
    assert(GraphQuery.BgpStats.computeCount.get() - before === 1L,
      "three multi-pattern queries over the same frame must share one stats job")
    // caller-provided stats: zero jobs, even with a cold cache
    val st = GraphQuery.BgpStats.compute(tri)
    SparqlLite.clearStatsCache()
    val b2 = GraphQuery.BgpStats.computeCount.get()
    SparqlLite.sparql(tri,
      "SELECT ?c ?n WHERE { ?c in_nation ?n . ?n in_region europe }",
      Some(st)).count()
    assert(GraphQuery.BgpStats.computeCount.get() === b2,
      "caller-provided stats must suppress the per-query compute entirely")
    // a subquery threads the outer stats through — still one job total
    SparqlLite.clearStatsCache()
    val b3 = GraphQuery.BgpStats.computeCount.get()
    SparqlLite.sparql(tri,
      """SELECT ?c ?n WHERE {
        |  ?c in_nation ?n . ?n in_region europe .
        |  { SELECT ?c WHERE { ?o ordered_by ?c . ?c in_nation ?n2 } }
        |}""".stripMargin).count()
    assert(GraphQuery.BgpStats.computeCount.get() - b3 === 1L,
      "subqueries must reuse the enclosing query's stats")
  }

  test("stats cache: LRU eviction drops only the coldest table (r6)") {
    import spark.implicits._
    SparqlLite.clearStatsCache()
    // 33 distinct tiny tables -> cache holds the 32 most recent
    val frames = (0 to 32).map { i =>
      Seq((s"s$i", "p", s"o$i"), (s"s$i", "q", "x"))
        .toDF("subj", "pred", "obj").localCheckpoint()
    }
    frames.foreach(SparqlLite.cachedStats(_))
    assert(SparqlLite.statsCacheSize === 32, "cache must stay bounded at 32")
    var before = GraphQuery.BgpStats.computeCount.get()
    SparqlLite.cachedStats(frames(1)) // touch: now the most-recently-used
    assert(GraphQuery.BgpStats.computeCount.get() === before,
      "frame 1 must still be cached (only frame 0 was evicted)")
    before = GraphQuery.BgpStats.computeCount.get()
    SparqlLite.cachedStats(frames(0)) // was evicted as the eldest
    assert(GraphQuery.BgpStats.computeCount.get() - before === 1L,
      "frame 0 must have been the one evicted")
    // the re-insert of frame 0 evicts frame 2 (frame 1 was just touched,
    // so access order - not insertion order - decides the victim)
    before = GraphQuery.BgpStats.computeCount.get()
    SparqlLite.cachedStats(frames(1))
    assert(GraphQuery.BgpStats.computeCount.get() === before,
      "LRU must evict by access order: the touched frame 1 survives")
    before = GraphQuery.BgpStats.computeCount.get()
    SparqlLite.cachedStats(frames(2))
    assert(GraphQuery.BgpStats.computeCount.get() - before === 1L,
      "frame 2 (coldest) must have been evicted instead")
    SparqlLite.clearStatsCache()
  }

  test("stats persist beside the table: save/load round-trips and feeds sparql") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats").toString
    val st = GraphQuery.BgpStats.compute(tri)
    GraphQuery.BgpStats.save(st, dir + "/stats", spark)
    val loaded = GraphQuery.BgpStats.load(dir + "/stats", spark)
    assert(loaded === st, "persisted stats must round-trip value-exact")
    // the loaded artifact drives a query with ZERO stats jobs
    val before = GraphQuery.BgpStats.computeCount.get()
    val got = SparqlLite.sparql(tri,
      "SELECT ?c ?n WHERE { ?c in_nation ?n . ?n in_region europe }",
      Some(loaded))
    assert(rows(got).size === 4)
    assert(GraphQuery.BgpStats.computeCount.get() === before)
  }

  test("greedy frame order: paths participate, bindings unchanged") {
    // expensive frame written FIRST (an unbounded closure), selective
    // plain pattern last — the planner may reorder, the rows may not
    // change
    val a = SparqlLite.sparql(tri,
      """SELECT ?c ?x WHERE {
        |  ?c (in_nation|in_region)+ ?x . ?o ordered_by ?c
        |}""".stripMargin)
    val b = SparqlLite.sparql(tri,
      """SELECT ?c ?x WHERE {
        |  ?o ordered_by ?c . ?c (in_nation|in_region)+ ?x
        |}""".stripMargin)
    assert(rows(a) === rows(b))
    assert(rows(a) === Set(Seq("c1", "de"), Seq("c1", "europe")))
  }

  test("constant-endpoint paths: seeded closure == full closure + filter") {
    // chain c1 → de → europe plus a cycle europe → de so the seeded
    // fixpoint must terminate on a cycle reachable FROM the seed
    val tri2 = tri.unionAll(Seq(("europe", "in_nation", "de"))
      .toDF("subj", "pred", "obj"))
    // bound subject: the closure is seeded at c1 (GraphQuery
    // .pathPairsFrom), never the all-pairs fixpoint
    val fromC1 = SparqlLite.sparql(tri2,
      "SELECT ?x WHERE { c1 (in_nation|in_region)+ ?x }")
    assert(rows(fromC1) === Set(Seq("de"), Seq("europe")))
    // bound object: seeds the REVERSED path and swaps back
    val toEurope = SparqlLite.sparql(tri2,
      "SELECT ?c WHERE { ?c (in_nation|in_region)+ europe }")
    assert(rows(toEurope) ===
      Set(Seq("c1"), Seq("c2"), Seq("c3"), Seq("c4"), Seq("de"), Seq("fr"),
        Seq("europe")))
    // both endpoints bound still answers (ASK-style point lookup)
    assert(rows(SparqlLite.sparql(tri2,
      "SELECT ?x WHERE { c1 in_nation+/in_region ?x . ?x in_nation de }"))
      === Set(Seq("europe")))
    // star with a bound subject keeps the zero-length row
    assert(rows(SparqlLite.sparql(tri2,
      "SELECT ?x WHERE { de in_region* ?x }"))
      === Set(Seq("de"), Seq("europe")))
    // unreachable constant: empty, not an error
    assert(rows(SparqlLite.sparql(tri2,
      "SELECT ?x WHERE { o1 in_nation+ ?x }")) === Set.empty)
  }

  test("property paths: unbounded + runs to fixpoint; * adds reflexive rows") {
    // a 14-link chain — the pre-round-4 default bound (10) would
    // truncate it; unbounded `+` must reach the far end and stop on the
    // empty frontier, not on any hop count
    val chain = (0 until 14).map(i => (f"n$i%02d", "next", f"n${i + 1}%02d"))
      .toDF("subj", "pred", "obj")
    val plus = SparqlLite.sparql(chain, "SELECT ?b WHERE { n00 next+ ?b }")
    assert(rows(plus) === (1 to 14).map(i => Seq(f"n$i%02d")).toSet)
    // `*` from a constant endpoint includes the zero-length self row
    val star = SparqlLite.sparql(chain, "SELECT ?b WHERE { n00 next* ?b }")
    assert(rows(star) === (0 to 14).map(i => Seq(f"n$i%02d")).toSet)
    // with both ends unbound, the zero-length path ranges over EVERY
    // term of the graph (SPARQL 1.1: it does not constrain the
    // predicate) — identity rows for all subjects/objects, plus the
    // ordinary closure pairs
    val refl = SparqlLite.sparql(tri, "SELECT ?a ?b WHERE { ?a in_region* ?b }")
    val terms = tri.select("subj").unionAll(tri.select("obj"))
      .distinct().as[String].collect().toSet
    val expected = terms.map(t => Seq(t, t)) ++
      Set(Seq("de", "europe"), Seq("fr", "europe"))
    assert(rows(refl) === expected)
    // `+N` stays the bounded form
    val bounded = SparqlLite.sparql(chain, "SELECT ?b WHERE { n00 next+2 ?b }")
    assert(rows(bounded) === Set(Seq("n01"), Seq("n02")))
  }

  test("FILTER expressions: arithmetic precedence, string functions") {
    // * binds tighter than +; comparison is numeric (ages 31, 9, 40)
    val arith = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a . FILTER ( ?a * 2 + 1 > 20 ) }")
    assert(rows(arith) === Set(Seq("c1"), Seq("c3")))
    // parens override precedence: (a + 1) * 2 > 20 keeps 31 and 40 only
    val paren = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a . FILTER ( ( ?a + 1 ) * 2 > 21 ) }")
    assert(rows(paren) === Set(Seq("c1"), Seq("c3")))
    // CONTAINS / STRSTARTS / STRENDS over bindings
    val contains = SparqlLite.sparql(tri,
      "SELECT ?n WHERE { ?n in_region europe . FILTER ( CONTAINS ( ?n , 'd' ) ) }")
    assert(rows(contains) === Set(Seq("de")))
    val starts = SparqlLite.sparql(tri,
      "SELECT ?n WHERE { ?n in_region europe . FILTER ( STRSTARTS ( ?n , 'f' ) ) }")
    assert(rows(starts) === Set(Seq("fr")))
    // UCASE/SUBSTR/CONCAT compose; STRLEN is numeric
    val ucase = SparqlLite.sparql(tri,
      "SELECT ?n WHERE { ?n in_region europe . FILTER ( UCASE ( ?n ) = 'DE' ) }")
    assert(rows(ucase) === Set(Seq("de")))
    val sub = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c in_nation ?n . FILTER ( SUBSTR ( ?c , 2 , 1 ) = '1' ) }")
    assert(rows(sub) === Set(Seq("c1")))
    val strlen = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a . FILTER ( STRLEN ( ?a ) >= 2 ) }")
    assert(rows(strlen) === Set(Seq("c1"), Seq("c3")))
    val concat = SparqlLite.sparql(tri,
      "SELECT ?n WHERE { ?n in_region europe . FILTER ( CONCAT ( ?n , '!' ) = 'de!' ) }")
    assert(rows(concat) === Set(Seq("de")))
    // a non-boolean FILTER body is rejected at parse time
    intercept[IllegalArgumentException](SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a . FILTER ( ?a + 1 ) }"))
  }

  test("FILTER boolean connectives: && || ! with grouping and backtracking") {
    // ages: c1 31, c2 9, c3 40
    val and = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a . FILTER ( ?a > 10 && ?a < 35 ) }")
    assert(rows(and) === Set(Seq("c1")))
    val or = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a . FILTER ( ?a < 10 || ?a > 35 ) }")
    assert(rows(or) === Set(Seq("c2"), Seq("c3")))
    val not = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a . FILTER ( ! ( ?a = 9 ) ) }")
    assert(rows(not) === Set(Seq("c1"), Seq("c3")))
    // grouping: (A || B) && C — and && binds tighter than || without it
    val grouped = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a . FILTER ( ( ?a < 10 || ?a > 35 ) && ?a != 40 ) }")
    assert(rows(grouped) === Set(Seq("c2")))
    val tight = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a . FILTER ( ?a < 10 || ?a > 35 && ?a != 40 ) }")
    assert(rows(tight) === Set(Seq("c2")), "&& must bind tighter than ||")
    // the arithmetic-group backtrack still works next to connectives
    val mixed = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a . FILTER ( ( ?a + 1 ) * 2 > 21 && CONTAINS ( ?c , 'c' ) ) }")
    assert(rows(mixed) === Set(Seq("c1"), Seq("c3")))
  }

  test("property path ?: zero-or-one pairs without closure") {
    val chain = (0 until 4).map(i => (s"n$i", "next", s"n${i + 1}"))
      .toDF("subj", "pred", "obj")
    val opt = SparqlLite.sparql(chain, "SELECT ?b WHERE { n0 next? ?b }")
    assert(rows(opt) === Set(Seq("n0"), Seq("n1")),
      "n0 next? = itself (zero) plus its direct successor (one) — no closure")
    // composes inside a path expression: one optional hop then a real hop
    val comp = SparqlLite.sparql(chain, "SELECT ?b WHERE { n0 next?/next ?b }")
    assert(rows(comp) === Set(Seq("n1"), Seq("n2")))
  }

  test("BIND: computed bindings join the frame, feed filters and selects") {
    val b = SparqlLite.sparql(tri,
      """SELECT ?c ?dbl WHERE { ?c age ?a .
        |  BIND ( ?a * 2 AS ?dbl ) . FILTER ( ?dbl >= 62 ) }""".stripMargin)
    assert(rows(b) === Set(Seq("c1", "62.0"), Seq("c3", "80.0")))
    // a later BIND may use an earlier one; SELECT * includes bind vars
    val chain = SparqlLite.sparql(tri,
      """SELECT * WHERE { ?c age ?a .
        |  BIND ( ?a + 1 AS ?b ) . BIND ( ?b * 0 AS ?z ) }""".stripMargin)
    assert(chain.columns.toSeq === Seq("c", "a", "b", "z"))
    assert(chain.count() === 3)
    // string BIND: UCASE flows into equality like any binding
    val sb = SparqlLite.sparql(tri,
      """SELECT ?u WHERE { ?n in_region europe .
        |  BIND ( UCASE ( ?n ) AS ?u ) . FILTER ( ?u != 'DE' ) }""".stripMargin)
    assert(rows(sb) === Set(Seq("FR")))
    def bad(q: String): Unit =
      intercept[IllegalArgumentException](SparqlLite.sparql(tri, q))
    bad("SELECT ?c WHERE { ?c age ?a . BIND ( ?a AS ?a ) }")      // rebind
    bad("SELECT ?c WHERE { ?c age ?a . BIND ( ?nope + 1 AS ?b ) }") // unbound
    bad("SELECT ?c WHERE { ?c age ?a . FILTER ( ?ghost > 1 ) }")  // unbound
  }

  test("review regressions: glued dot, VALUES over BIND, subquery PREFIX") {
    // a dot glued to the object term is punctuation, not part of the term
    val glued = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c in_nation de. }")
    assert(rows(glued) === Set(Seq("c1"), Seq("c2")))
    // VALUES over a BIND-computed variable restricts it (binds apply first)
    val vb = SparqlLite.sparql(tri,
      """SELECT ?c WHERE { ?c age ?a .
        |  BIND ( ?a + 1 AS ?b ) . VALUES ?b { '32.0' '10.0' } }""".stripMargin)
    assert(rows(vb) === Set(Seq("c1"), Seq("c2")))
    // outer PREFIX declarations reach into subqueries
    val iri = Seq(("c1", "http://e/p", "x"), ("c2", "http://e/p", "y"))
      .toDF("subj", "pred", "obj")
    val sp = SparqlLite.sparql(iri,
      """PREFIX ex: <http://e/>
        |SELECT ?s WHERE { { SELECT ?s WHERE { ?s ex:p ?o } } }""".stripMargin)
    assert(rows(sp) === Set(Seq("c1"), Seq("c2")))
  }

  test("subqueries: aggregate-in-subquery joins the outer group") {
    // per-customer order counts via subquery, joined to the nation graph
    val sq = SparqlLite.sparql(tri,
      """SELECT ?c ?n ?cnt WHERE {
        |  ?c in_nation ?n .
        |  { SELECT ?c (COUNT(*) AS ?cnt) WHERE { ?o ordered_by ?c } GROUP BY ?c }
        |}""".stripMargin)
    assert(rows(sq) === Set(Seq("c1", "de", "2")),
      "only customers the subquery projects join the outer graph")
    // subquery with ORDER BY + LIMIT: the classic top-k-then-join
    // (bindings sort as STRINGS — the documented ORDER BY restriction —
    // so DESC takes "9" before "40")
    val topk = SparqlLite.sparql(tri,
      """SELECT ?c ?a WHERE {
        |  ?c in_nation ?n .
        |  { SELECT ?c ?a WHERE { ?c age ?a } ORDER BY DESC ( ?a ) LIMIT 2 }
        |}""".stripMargin)
    assert(rows(topk) === Set(Seq("c2", "9"), Seq("c3", "40")))
    // a subquery can be the only group member
    val only = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { { SELECT ?c WHERE { ?o ordered_by ?c } } }")
    assert(rows(only) === Set(Seq("c1")))
    def bad(q: String): Unit =
      intercept[IllegalArgumentException](SparqlLite.sparql(tri, q))
    bad("SELECT ?c WHERE { { SELECT ?z WHERE { ?z bad } } }") // malformed sub
    bad("SELECT ?x WHERE { { SELECT ?c WHERE { ?o ordered_by ?c } } }") // unbound
  }

  test("multi-variable VALUES joins an inline binding table") {
    val vt = SparqlLite.sparql(tri,
      """SELECT ?c ?n WHERE { ?c in_nation ?n .
        |  VALUES ( ?c ?n ) { ( c1 de ) ( c3 fr ) ( c4 de ) } }""".stripMargin)
    // (c4, de) is in the VALUES table but not in the data — no row
    assert(rows(vt) === Set(Seq("c1", "de"), Seq("c3", "fr")))
    def bad(q: String): Unit =
      intercept[IllegalArgumentException](SparqlLite.sparql(tri, q))
    bad("""SELECT ?c WHERE { ?c in_nation ?n .
        |  VALUES ( ?c ?n ) { ( c1 ) } }""".stripMargin)   // arity mismatch
    bad("""SELECT ?c WHERE { ?c in_nation ?n .
        |  VALUES ( ?c ?ghost ) { ( c1 x ) } }""".stripMargin) // unbound var
  }

  test("FILTER EXISTS / NOT EXISTS compile to semi/anti pattern tests") {
    val ex = SparqlLite.sparql(tri,
      """SELECT ?c WHERE { ?c in_nation ?n .
        |  FILTER EXISTS { ?o ordered_by ?c } }""".stripMargin)
    assert(rows(ex) === Set(Seq("c1")),
      "semi-join: one row per solution, never multiplied by matches")
    val nex = SparqlLite.sparql(tri,
      """SELECT ?c WHERE { ?c in_nation ?n .
        |  FILTER NOT EXISTS { ?o ordered_by ?c } }""".stripMargin)
    assert(rows(nex) === Set(Seq("c2"), Seq("c3"), Seq("c4")))
    // composes with an expression FILTER in the same group
    val both = SparqlLite.sparql(tri,
      """SELECT ?c WHERE { ?c in_nation ?n .
        |  FILTER NOT EXISTS { ?o ordered_by ?c } . FILTER ( ?n = 'de' ) }""".stripMargin)
    assert(rows(both) === Set(Seq("c2")))
    // an uncorrelated EXISTS group is rejected
    intercept[IllegalArgumentException](SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c in_nation ?n . FILTER EXISTS { ?x age ?y } }"))
  }

  test("FILTER inside OPTIONAL narrows the group, never the solution") {
    // inner filter: only o2 can match — c1 still appears (with o2), and
    // an inner filter must NEVER drop required-graph solutions
    val inner = SparqlLite.sparql(tri,
      """SELECT ?c ?o WHERE { ?c in_nation ?n .
        |  OPTIONAL { ?o ordered_by ?c . FILTER ( ?o != 'o1' ) } }""".stripMargin)
    assert(rows(inner) === Set(Seq("c1", "o2"), Seq("c2", null),
      Seq("c3", null), Seq("c4", null)))
    // contrast: the same predicate OUTSIDE the group removes solutions
    // where it is false (null != 'o1' is null → dropped)
    val outer = SparqlLite.sparql(tri,
      """SELECT ?c ?o WHERE { ?c in_nation ?n .
        |  OPTIONAL { ?o ordered_by ?c } . FILTER ( ?o != 'o1' ) }""".stripMargin)
    assert(rows(outer) === Set(Seq("c1", "o2")))
    // an inner filter over a variable the group does not bind is rejected
    intercept[IllegalArgumentException](SparqlLite.sparql(tri,
      """SELECT ?c WHERE { ?c in_nation ?n .
        |  OPTIONAL { ?o ordered_by ?c . FILTER ( ?n = 'de' ) } }""".stripMargin))
  }

  test("BOUND over OPTIONAL nulls; COALESCE and IF expressions") {
    // c1 has orders; c2/c3/c4 do not — !BOUND is negation by failure
    val noOrders = SparqlLite.sparql(tri,
      """SELECT ?c WHERE { ?c in_nation ?n .
        |  OPTIONAL { ?o ordered_by ?c } .
        |  FILTER ( ! ( BOUND ( ?o ) ) ) }""".stripMargin)
    assert(rows(noOrders) === Set(Seq("c2"), Seq("c3"), Seq("c4")))
    val bound = SparqlLite.sparql(tri,
      """SELECT DISTINCT ?c WHERE { ?c in_nation ?n .
        |  OPTIONAL { ?o ordered_by ?c } . FILTER ( BOUND ( ?o ) ) }""".stripMargin)
    assert(rows(bound) === Set(Seq("c1")))
    // COALESCE fills OPTIONAL nulls; IF branches on a boolean
    val coal = SparqlLite.sparql(tri,
      """SELECT DISTINCT ?c ?x WHERE { ?c in_nation ?n .
        |  OPTIONAL { ?o ordered_by ?c } .
        |  BIND ( COALESCE ( ?o , 'none' ) AS ?x ) }""".stripMargin)
    assert(rows(coal).contains(Seq("c2", "none")))
    assert(rows(coal).filter(_.head == "c1").map(_(1)) === Set("o1", "o2"))
    val iff = SparqlLite.sparql(tri,
      """SELECT ?c ?band WHERE { ?c age ?a .
        |  BIND ( IF ( ?a >= 30 , 'senior' , 'junior' ) AS ?band ) }""".stripMargin)
    assert(rows(iff) === Set(Seq("c1", "senior"), Seq("c2", "junior"),
      Seq("c3", "senior")))
  }

  test("GROUP_CONCAT/SAMPLE aggregates and HAVING") {
    val gc = SparqlLite.sparql(tri,
      """SELECT ?n (GROUP_CONCAT(?c) AS ?members) WHERE { ?c in_nation ?n }
        |GROUP BY ?n""".stripMargin)
    assert(rows(gc) === Set(Seq("de", "c1 c2"), Seq("fr", "c3 c4")),
      "members must concatenate in SORTED order")
    val smp = SparqlLite.sparql(tri,
      """SELECT ?n (SAMPLE(?c) AS ?one) WHERE { ?c in_nation ?n }
        |GROUP BY ?n""".stripMargin)
    assert(rows(smp) === Set(Seq("de", "c1"), Seq("fr", "c3")),
      "SAMPLE is deterministic: the minimum binding")
    val hav = SparqlLite.sparql(tri,
      """SELECT ?c (COUNT(*) AS ?cnt) WHERE { ?o ordered_by ?c }
        |GROUP BY ?c HAVING ( ?cnt >= 2 )""".stripMargin)
    assert(rows(hav) === Set(Seq("c1", "2")))
    def bad(q: String): Unit =
      intercept[IllegalArgumentException](SparqlLite.sparql(tri, q))
    bad("SELECT ?c WHERE { ?c in_nation ?n } HAVING ( ?c > 1 )") // no aggs
    bad("""SELECT ?n (COUNT(*) AS ?cnt) WHERE { ?c in_nation ?n }
        |GROUP BY ?n HAVING ( ?ghost > 1 )""".stripMargin)       // unbound
  }

  test("ORDER BY with LIMIT is deterministic top-k; unselected keys sort plain selects") {
    val got = SparqlLite.sparql(tri,
      """SELECT ?c ?a WHERE { ?c age ?a }
        |ORDER BY DESC(?a) ?c LIMIT 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // string ordering: '9' > '40' > '31' lexicographically
    assert(got === Seq(("c2", "9"), ("c3", "40")))
    // a NON-selected key orders a plain select: the planner sorts
    // before projecting (ages: c2=9 < c1=31 < c3=40 as strings '31'<'40'<'9')
    val unsel = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a } ORDER BY ?a LIMIT 2")
      .collect().map(_.getString(0)).toSeq
    assert(unsel === Seq("c1", "c3"))
    // DISTINCT and aggregates collapse rows after projection — an
    // unselected key no longer exists there, still rejected
    intercept[IllegalArgumentException](SparqlLite.sparql(tri,
      "SELECT DISTINCT ?c WHERE { ?c age ?a } ORDER BY ?a"))
    intercept[IllegalArgumentException](SparqlLite.sparql(tri,
      """SELECT ?c (COUNT(?a) AS ?n) WHERE { ?c age ?a }
        |GROUP BY ?c ORDER BY ?a""".stripMargin))
  }

  test("COUNT/SUM DISTINCT aggregates; REGEX and STR in FILTER") {
    val dup = tri.unionAll(Seq(("c9", "in_nation", "de"))
      .toDF("subj", "pred", "obj"))
    // 5 customers over 2 distinct nations
    val cd = SparqlLite.sparql(dup,
      """SELECT (COUNT(?n) AS ?rows) (COUNT(DISTINCT ?n) AS ?nations)
        |WHERE { ?c in_nation ?n }""".stripMargin)
    assert(rows(cd) === Set(Seq("5", "2")))
    // SUM(DISTINCT): ages 31, 9, 40 plus a duplicated 31
    val dupAge = tri.unionAll(Seq(("c4", "age", "31"))
      .toDF("subj", "pred", "obj"))
    val sd = SparqlLite.sparql(dupAge,
      """SELECT (SUM(?a) AS ?all) (SUM(DISTINCT ?a) AS ?uniq)
        |WHERE { ?c age ?a }""".stripMargin)
    assert(rows(sd) === Set(Seq("111.0", "80.0")))
    // REGEX: unanchored find semantics
    val re = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c age ?a . FILTER ( REGEX ( ?a , '^[34]' ) ) }")
    assert(rows(re) === Set(Seq("c1"), Seq("c3")))
    // STR lets a computed numeric binding feed string comparison
    val str = SparqlLite.sparql(tri,
      """SELECT ?c WHERE { ?c age ?a . BIND ( ?a + 1 AS ?b )
        |FILTER ( STRSTARTS ( STR ( ?b ) , '32' ) ) }""".stripMargin)
    assert(rows(str) === Set(Seq("c1")))
    // DISTINCT only for COUNT and SUM
    intercept[IllegalArgumentException](SparqlLite.sparql(tri,
      "SELECT (MIN(DISTINCT ?a) AS ?x) WHERE { ?c age ?a }"))
  }

  test("FILTER inside UNION branches and MINUS/EXISTS groups") {
    // a FILTER scoped to ONE union branch narrows only that branch
    val uf = SparqlLite.sparql(tri,
      """SELECT ?x ?n WHERE {
        |  { ?x in_nation ?n . FILTER ( ?n = 'de' ) }
        |  UNION { ?n in_region ?x }
        |}""".stripMargin)
    assert(rows(uf) === Set(
      Seq("c1", "de"), Seq("c2", "de"),
      Seq("europe", "de"), Seq("europe", "fr")))
    // MINUS body with an inner FILTER: remove only the de-customers
    // that have orders
    val mf = SparqlLite.sparql(tri,
      """SELECT ?c WHERE { ?c in_nation ?n .
        |  MINUS { ?o ordered_by ?c . FILTER ( STRSTARTS ( ?o , 'o' ) ) }
        |}""".stripMargin)
    assert(rows(mf) === Set(Seq("c2"), Seq("c3"), Seq("c4")))
    // EXISTS group with an inner FILTER
    val ef = SparqlLite.sparql(tri,
      """SELECT ?c WHERE { ?c in_nation ?n .
        |  FILTER EXISTS { ?o ordered_by ?c . FILTER ( ?o != 'o1' ) }
        |}""".stripMargin)
    assert(rows(ef) === Set(Seq("c1")))
    val nef = SparqlLite.sparql(tri,
      """SELECT ?c WHERE { ?c in_nation ?n .
        |  FILTER NOT EXISTS { ?o ordered_by ?c . FILTER ( ?o = 'o1' ) }
        |}""".stripMargin)
    assert(rows(nef) === Set(Seq("c2"), Seq("c3"), Seq("c4")))
    // a branch-inner FILTER over a var the branch does not bind: rejected
    intercept[IllegalArgumentException](SparqlLite.sparql(tri,
      """SELECT ?x ?n WHERE {
        |  { ?x in_nation ?n . FILTER ( ?ghost = 1 ) } UNION { ?n in_region ?x }
        |}""".stripMargin))
  }

  test("GROUP_CONCAT SEPARATOR clause; only GROUP_CONCAT takes one") {
    val got = SparqlLite.sparql(tri,
      """SELECT ?n (GROUP_CONCAT ( ?c ; SEPARATOR= ', ' ) AS ?cs)
        |WHERE { ?c in_nation ?n } GROUP BY ?n""".stripMargin)
    assert(rows(got) === Set(Seq("de", "c1, c2"), Seq("fr", "c3, c4")))
    // split `SEPARATOR =` form and empty separator
    val glued = SparqlLite.sparql(tri,
      """SELECT ?n (GROUP_CONCAT ( ?c ; SEPARATOR = '' ) AS ?cs)
        |WHERE { ?c in_nation ?n } GROUP BY ?n""".stripMargin)
    assert(rows(glued) === Set(Seq("de", "c1c2"), Seq("fr", "c3c4")))
    intercept[IllegalArgumentException](SparqlLite.sparql(tri,
      """SELECT ?n (COUNT ( ?c ; SEPARATOR= ',' ) AS ?x)
        |WHERE { ?c in_nation ?n } GROUP BY ?n""".stripMargin))
  }

  test("subqueries as UNION branches, both positions") {
    // first branch a subquery: customers of de, unioned with fr holders
    val subFirst = SparqlLite.sparql(tri,
      """SELECT ?c WHERE {
        |  { SELECT ?c WHERE { ?c in_nation de } }
        |  UNION { ?c in_nation fr }
        |}""".stripMargin)
    assert(rows(subFirst) ===
      Set(Seq("c1"), Seq("c2"), Seq("c3"), Seq("c4")))
    // later branch a subquery (with an inner aggregate-free projection)
    val subLater = SparqlLite.sparql(tri,
      """SELECT ?c WHERE {
        |  { ?c in_nation fr }
        |  UNION { SELECT ?c WHERE { ?o ordered_by ?c } }
        |}""".stripMargin)
    assert(rows(subLater) === Set(Seq("c3"), Seq("c4"), Seq("c1")))
    // a lone subquery stays a plain subquery item (no union)
    val lone = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { { SELECT ?c WHERE { ?c in_nation de } } . ?c age ?a }")
    assert(rows(lone) === Set(Seq("c1"), Seq("c2")))
  }

  test("nested groups: OPTIONAL inside OPTIONAL, UNION inside OPTIONAL, BIND inside group") {
    val tri3 = tri.unionAll(Seq(("o1", "amount", "5"), ("c3", "vip", "yes"))
      .toDF("subj", "pred", "obj"))
    // OPTIONAL { ... OPTIONAL { ... } }: c1's orders optionally carry
    // amounts; customers without orders keep both nulls
    val nested = SparqlLite.sparql(tri3,
      """SELECT ?c ?o ?amt WHERE { ?c in_nation ?n .
        |  OPTIONAL { ?o ordered_by ?c . OPTIONAL { ?o amount ?amt } }
        |}""".stripMargin)
    assert(rows(nested) === Set(
      Seq("c1", "o1", "5"), Seq("c1", "o2", null),
      Seq("c2", null, null), Seq("c3", null, null), Seq("c4", null, null)))
    // UNION inside OPTIONAL: a group matching either an order or a vip
    // flag, left-joined
    val uo = SparqlLite.sparql(tri3,
      """SELECT ?c ?mark WHERE { ?c in_nation ?n .
        |  OPTIONAL { { ?mark ordered_by ?c } UNION { ?c vip ?mark } }
        |}""".stripMargin)
    assert(rows(uo) === Set(
      Seq("c1", "o1"), Seq("c1", "o2"), Seq("c3", "yes"),
      Seq("c2", null), Seq("c4", null)))
    // BIND inside an OPTIONAL group computes before the left join and
    // its column survives outward
    val bo = SparqlLite.sparql(tri3,
      """SELECT ?c ?double WHERE { ?c in_nation ?n .
        |  OPTIONAL { ?c age ?a . BIND ( ?a * 2 AS ?double ) }
        |}""".stripMargin)
    assert(rows(bo) === Set(
      Seq("c1", "62.0"), Seq("c2", "18.0"), Seq("c3", "80.0"),
      Seq("c4", null)))
  }

  test("MINUS anti-joins on shared variables; disjoint MINUS rejected") {
    val tri2 = tri.unionAll(Seq(("c1", "vip", "yes"), ("c4", "vip", "yes"))
      .toDF("subj", "pred", "obj"))
    val got = SparqlLite.sparql(tri2,
      "SELECT ?c WHERE { ?c in_nation ?n . MINUS { ?c vip yes } }")
    assert(rows(got) === Set(Seq("c2"), Seq("c3")))
    intercept[IllegalArgumentException](SparqlLite.sparql(tri2,
      "SELECT ?c WHERE { ?c in_nation ?n . MINUS { ?z vip yes } }"))
  }

  test("UNION merges same-variable branches and joins the rest") {
    val got = SparqlLite.sparql(tri,
      """SELECT ?x ?n WHERE {
        |  { ?x in_nation ?n } UNION { ?n in_region ?x }
        |}""".stripMargin)
    assert(rows(got) === Set(
      Seq("c1", "de"), Seq("c2", "de"), Seq("c3", "fr"), Seq("c4", "fr"),
      Seq("europe", "de"), Seq("europe", "fr")))
    // the union frame joins a plain pattern on its shared variable
    val joined = SparqlLite.sparql(tri,
      """SELECT ?x ?a WHERE {
        |  { ?x in_nation de } UNION { ?x in_nation fr } .
        |  ?x age ?a
        |}""".stripMargin)
    assert(rows(joined) === Set(Seq("c1", "31"), Seq("c2", "9"),
      Seq("c3", "40")))
    intercept[IllegalArgumentException](SparqlLite.sparql(tri,
      "SELECT ?x WHERE { { ?x in_nation ?n } UNION { ?x age ?z } }"))
    intercept[IllegalArgumentException](SparqlLite.sparql(tri,
      "SELECT ?x WHERE { { ?x in_nation ?n } }")) // braces without UNION
  }

  test("OFFSET pages an ordered solution sequence") {
    val got = SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c in_nation ?n } ORDER BY ?c LIMIT 2 OFFSET 1")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("c2", "c3"))
    intercept[IllegalArgumentException](SparqlLite.sparql(tri,
      "SELECT ?c WHERE { ?c in_nation ?n } OFFSET 1 OFFSET 2"))
  }

  test("CONSTRUCT templates a new graph; constants allowed; set semantics") {
    val got = SparqlLite.sparql(tri,
      """CONSTRUCT { ?n has_customer ?c . ?n a Nation }
        |WHERE { ?c in_nation ?n }""".stripMargin)
    assert(got.columns.toSeq === Seq("subj", "pred", "obj"))
    assert(rows(got) === Set(
      Seq("de", "has_customer", "c1"), Seq("de", "has_customer", "c2"),
      Seq("fr", "has_customer", "c3"), Seq("fr", "has_customer", "c4"),
      Seq("de", "a", "Nation"), Seq("fr", "a", "Nation")))
  }

  test("DESCRIBE returns the outgoing triples of every binding") {
    val got = SparqlLite.sparql(tri,
      "DESCRIBE ?n WHERE { ?c in_nation ?n }")
    assert(got.columns.toSeq === Seq("subj", "pred", "obj"))
    assert(rows(got) === Set(
      Seq("de", "in_region", "europe"), Seq("fr", "in_region", "europe")))
    intercept[IllegalArgumentException](SparqlLite.sparql(tri,
      "DESCRIBE ?z WHERE { ?c in_nation ?n }"))
  }

  test("ASK answers one boolean row") {
    def ask(q: String): Boolean =
      SparqlLite.sparql(tri, q).collect()(0).getBoolean(0)
    assert(ask("ASK { ?c in_nation de }"))
    assert(!ask("ASK { ?c in_nation jp }"))
  }

  test("malformed queries are rejected loudly") {
    def bad(q: String): Unit =
      intercept[IllegalArgumentException](SparqlLite.sparql(tri, q))
    bad("SELECT ?c WHERE { ?c in_nation }")              // 2-term pattern
    bad("SELECT ?x WHERE { ?c in_nation ?n }")           // unbound select
    bad("SELECT ?c WHERE { ?c in_nation ?n . FILTER ( ?z = de ) }") // unbound filter
    bad("SELECT ?c WHERE { c1 in_nation de }")           // var-free pattern
    bad("SELECT ?c WHERE { ?c in_nation ?n } extra")     // trailing tokens
    bad("SELECT ?c WHERE { ?c in_nation 'de }")          // unterminated quote
    bad("SELECT ?c WHERE { OPTIONAL { ?o ordered_by ?c } }") // no required
    bad("CONSTRUCT { ?z p ?c } WHERE { ?c in_nation ?n }")   // unbound template
    bad("CONSTRUCT { } WHERE { ?c in_nation ?n }")           // empty template
    bad("INSERT ?c WHERE { ?c in_nation ?n }")               // unsupported form
    bad("ASK { ?c in_nation ?n } LIMIT 1")                   // would be dropped
    bad("DESCRIBE ?c WHERE { ?c in_nation ?n } LIMIT 1")     // would be dropped
    // an OPTIONAL-inner FILTER is legal since round 4 — but only over
    // variables the group itself binds
    bad("SELECT ?c WHERE { ?c in_nation ?n . OPTIONAL { ?o ordered_by ?c . FILTER ( ?n != de ) } }")
  }
}

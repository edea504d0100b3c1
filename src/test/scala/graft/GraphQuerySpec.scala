package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.GraphQuery
import graft.operators.GraphQuery.TriplePattern

/** KG query surface: semi-naive transitive closure vs a driver-local
  * brute-force closure (incl. a 30-link chain past any fixed superstep
  * count), BGP matching vs hand-computed bindings, the as-of join vs a
  * per-row scan reference, validity intervals / snapshots, and N-Triples
  * escaping pinned to hand-written expected strings.
  */
class GraphQuerySpec extends SparkSpec {

  import spark.implicits._

  // -------------------------------------------------- transitive closure

  /** Driver-local reference: BFS from every node over the edge list. */
  private def localClosure(es: Seq[(String, String)], maxHops: Int): Set[(String, String, Int)] = {
    val adj = es.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val srcs = es.map(_._1).distinct
    srcs.flatMap { s =>
      val dist = scala.collection.mutable.Map.empty[String, Int]
      var frontier = Set(s)
      var h = 0
      while (frontier.nonEmpty && h < maxHops) {
        h += 1
        frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .filterNot(dist.contains)
        frontier.foreach(n => dist(n) = h)
      }
      dist.map { case (d, hp) => (s, d, hp) }
    }.toSet
  }

  private def closureSet(df: DataFrame): Set[(String, String, Int)] =
    df.select("src", "dst", "hops").as[(String, String, Int)].collect().toSet

  test("transitive closure matches brute force on a cyclic graph") {
    val es = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "d"),
      ("e", "a"), ("x", "y"))
    val df = es.toDF("src", "dst")
    for (k <- Seq(1, 2, 4, 8)) {
      assert(closureSet(GraphQuery.transitiveClosure(df, k)) ===
        localClosure(es, k), s"maxHops=$k")
    }
  }

  test("transitive closure resolves a 30-link chain and stops early") {
    val es = (0 until 30).map(i => (f"n$i%02d", f"n${i + 1}%02d"))
    val got = closureSet(GraphQuery.transitiveClosure(es.toDF("src", "dst"), 64))
    assert(got === localClosure(es, 64))
    assert(got.size === (31 * 30) / 2)
    assert(got.contains(("n00", "n30", 30)))
  }

  test("transitive closure drops null endpoints and dedupes parallel edges") {
    val df = Seq(("a", "b"), ("a", "b"), ("a", null), (null, "b"))
      .toDF("src", "dst")
    assert(closureSet(GraphQuery.transitiveClosure(df, 3)) === Set(("a", "b", 1)))
  }

  // ---------------------------------------------------------------- bgp

  private lazy val triples: DataFrame = Seq(
    ("c1", "in_nation", "de"), ("c2", "in_nation", "de"),
    ("c3", "in_nation", "fr"),
    ("s1", "supplies_in", "de"), ("s2", "supplies_in", "fr"),
    ("de", "in_region", "europe"), ("fr", "in_region", "europe"),
    ("self", "same_as", "self")
  ).toDF("subj", "pred", "obj")

  test("bgp two-pattern join binds shared variables") {
    val got = GraphQuery.bgpMatch(triples, Seq(
      TriplePattern("?c", "in_nation", "?n"),
      TriplePattern("?s", "supplies_in", "?n")))
    assert(got.columns.toSeq === Seq("c", "n", "s"))
    assert(got.as[(String, String, String)].collect().toSet === Set(
      ("c1", "de", "s1"), ("c2", "de", "s1"), ("c3", "fr", "s2")))
  }

  test("bgp chain through a second hop with a constant object") {
    val got = GraphQuery.bgpMatch(triples, Seq(
      TriplePattern("?c", "in_nation", "?n"),
      TriplePattern("?n", "in_region", "europe")))
    assert(got.select("c").as[String].collect().toSet === Set("c1", "c2", "c3"))
  }

  test("bgp repeated variable within one pattern is an equality constraint") {
    val got = GraphQuery.bgpMatch(triples, Seq(TriplePattern("?x", "same_as", "?x")))
    assert(got.as[String].collect().toSeq === Seq("self"))
  }

  test("bgp disconnected patterns cross-product; var-free pattern rejected") {
    val got = GraphQuery.bgpMatch(triples, Seq(
      TriplePattern("?a", "in_region", "europe"),
      TriplePattern("?b", "same_as", "?b")))
    assert(got.as[(String, String)].collect().toSet ===
      Set(("de", "self"), ("fr", "self")))
    intercept[IllegalArgumentException] {
      GraphQuery.bgpMatch(triples, Seq(TriplePattern("c1", "in_nation", "de")))
    }
  }

  // ------------------------------------------------- bgp join ordering

  test("orderPatterns: hub predicate joins last on a skewed fixture") {
    // skewed graph: 'mentions' is a hub predicate (200 triples), 'ceo_of'
    // is rare (2), 'hq_in' mid (20); user writes the hub FIRST
    val skewed = ((0 until 200).map(i => (s"d$i", "mentions", s"e${i % 50}")) ++
      (0 until 20).map(i => (s"e$i", "hq_in", s"city${i % 5}")) ++
      Seq(("p1", "ceo_of", "e1"), ("p2", "ceo_of", "e2")))
      .toDF("subj", "pred", "obj")
    val stats = GraphQuery.BgpStats.compute(skewed)
    val userOrder = Seq(
      TriplePattern("?d", "mentions", "?e"),   // hub: est 200
      TriplePattern("?e", "hq_in", "?city"),   // est 20
      TriplePattern("?p", "ceo_of", "?e"))     // est 2
    val ordered = GraphQuery.orderPatterns(userOrder, stats)
    assert(ordered.head === userOrder(2), "cheapest (ceo_of) must lead")
    assert(ordered.last === userOrder.head, "hub (mentions) must join last")
    // constant slots shrink the estimate: a constant obj on the hub
    // divides by its distinct-object count, overtaking the mid predicate
    assert(stats.estimate(TriplePattern("?d", "mentions", "e1"))
      < stats.estimate(TriplePattern("?e", "hq_in", "?city")))
    // unknown predicate estimates 0 — provably empty, always first
    assert(stats.estimate(TriplePattern("?a", "no_such_pred", "?b")) === 0.0)
  }

  test("orderPatterns: prefers a connected pattern over a cheaper disjoint one") {
    val df = ((0 until 100).map(i => (s"a$i", "big", s"b$i")) ++
      (0 until 10).map(i => (s"b$i", "mid", s"c$i")) ++
      Seq(("z1", "tiny", "z2"))).toDF("subj", "pred", "obj")
    val stats = GraphQuery.BgpStats.compute(df)
    val ps = Seq(
      TriplePattern("?x", "big", "?y"),
      TriplePattern("?y", "mid", "?z"),
      TriplePattern("?u", "tiny", "?v")) // cheapest but shares no var
    val ordered = GraphQuery.orderPatterns(ps, stats)
    // tiny leads (global cheapest), then the OTHER component must start
    // from its own cheapest (mid) and stay connected (big last) — never
    // interleave back to the disjoint component mid-chain
    assert(ordered === Seq(ps(2), ps(1), ps(0)))
  }

  test("bgp ordering is semantics-preserving: ordered == user-order bindings") {
    val userOrder = Seq(
      TriplePattern("?c", "in_nation", "?n"),
      TriplePattern("?s", "supplies_in", "?n"),
      TriplePattern("?n", "in_region", "europe"))
    val auto = GraphQuery.bgpMatch(triples, userOrder)
    val manual = GraphQuery.bgpMatch(triples, userOrder, stats = None)
    assert(auto.columns.toSeq === manual.columns.toSeq,
      "output column order follows the USER order regardless of join order")
    assert(auto.as[(String, String, String)].collect().sorted.toSeq
      === manual.as[(String, String, String)].collect().sorted.toSeq)
  }

  test("path algebra: Pred/Inv/Chain/Alt/Plus against hand-computed pair sets") {
    import GraphQuery.PathExpr._
    val tri = Seq(
      ("o1", "placed_by", "c1"), ("o2", "placed_by", "c2"),
      ("c1", "in", "n1"), ("c2", "in", "n2"),
      ("n1", "part_of", "r1"), ("n2", "part_of", "r1"),
      ("r1", "part_of", "w"),
      ("c1", "in", "n1") // duplicate — set semantics must collapse it
    ).toDF("subj", "pred", "obj")
    def pairs(e: GraphQuery.PathExpr): Set[(String, String)] =
      GraphQuery.pathPairs(tri, e).as[(String, String)].collect().toSet
    assert(pairs(Pred("in")) === Set(("c1", "n1"), ("c2", "n2")))
    assert(pairs(Inv(Pred("placed_by"))) === Set(("c1", "o1"), ("c2", "o2")))
    assert(pairs(Chain(Pred("in"), Pred("part_of"))) ===
      Set(("c1", "r1"), ("c2", "r1")))
    assert(pairs(Alt(Pred("in"), Pred("part_of"))) ===
      Set(("c1", "n1"), ("c2", "n2"), ("n1", "r1"), ("n2", "r1"), ("r1", "w")))
    assert(pairs(Plus(Pred("part_of"), 4)) ===
      Set(("n1", "r1"), ("n2", "r1"), ("r1", "w"), ("n1", "w"), ("n2", "w")))
    // the full composite: orders up through every containment level
    assert(pairs(Chain(Pred("placed_by"),
      Plus(Alt(Pred("in"), Pred("part_of")), 4))) === Set(
      ("o1", "n1"), ("o1", "r1"), ("o1", "w"),
      ("o2", "n2"), ("o2", "r1"), ("o2", "w")))
  }

  test("seeded path evaluation == full evaluation filtered to the seeds") {
    import GraphQuery.PathExpr._
    val tri = Seq(
      ("o1", "placed_by", "c1"), ("o2", "placed_by", "c2"),
      ("c1", "in", "n1"), ("c2", "in", "n2"),
      ("n1", "part_of", "r1"), ("n2", "part_of", "r1"),
      ("r1", "part_of", "w"), ("w", "part_of", "n1") // cycle back
    ).toDF("subj", "pred", "obj")
    val exprs = Seq[GraphQuery.PathExpr](
      Pred("in"),
      Inv(Pred("placed_by")),
      NegatedSet(Seq("placed_by")),
      Inv(NegatedSet(Seq("in", "part_of"))),
      NegatedSet(Seq("placed_by"), Seq("in")),   // mixed fwd+inv members
      NegatedSet(Seq.empty, Seq("part_of")),     // inverse-only set
      Inv(NegatedSet(Seq("in"), Seq("part_of"))),
      Chain(Pred("in"), Pred("part_of")),
      Alt(Pred("in"), Pred("part_of")),
      Plus(Pred("part_of"), 3),
      PlusAll(Pred("part_of")), // cyclic — seeded fixpoint must stop
      Star(Pred("part_of")),
      Opt(Pred("in")),
      Inv(Chain(Pred("in"), Plus(Pred("part_of"), 4))), // Inv over composite
      Chain(Pred("placed_by"), PlusAll(Alt(Pred("in"), Pred("part_of")))))
    val seedSets = Seq(Seq("c1"), Seq("n1"), Seq("o1", "r1"), Seq("ghost"),
      Seq("w"))
    for (e <- exprs; seeds <- seedSets) {
      val full = GraphQuery.pathPairs(tri, e)
        .where(col("src").isInCollection(seeds))
        .as[(String, String)].collect().toSet
      val seeded = GraphQuery.pathPairsFrom(tri, e,
        seeds.toDF("src")).as[(String, String)].collect().toSet
      assert(seeded === full, s"expr=$e seeds=$seeds")
    }
  }

  test("reverse(e) pairs == pairs(e) swapped, for every constructor") {
    import GraphQuery.PathExpr._
    val tri = Seq(
      ("a", "p", "b"), ("b", "p", "c"), ("b", "q", "d"), ("d", "r", "a")
    ).toDF("subj", "pred", "obj")
    val exprs = Seq[GraphQuery.PathExpr](
      Pred("p"), Inv(Pred("q")), Chain(Pred("p"), Pred("q")),
      Alt(Pred("p"), Pred("r")), Plus(Pred("p"), 3), PlusAll(Pred("p")),
      Star(Pred("q")), Opt(Pred("r")), NegatedSet(Seq("q")),
      NegatedSet(Seq("p"), Seq("q")), NegatedSet(Seq.empty, Seq("r")))
    exprs.foreach { e =>
      val fwd = GraphQuery.pathPairs(tri, e)
        .as[(String, String)].collect().toSet
      val rev = GraphQuery.pathPairs(tri, GraphQuery.reverse(e))
        .as[(String, String)].collect().toSet
      assert(rev === fwd.map(_.swap), s"expr=$e")
    }
  }

  test("bgp OPTIONAL keeps unmatched solutions with null bindings") {
    val tri = triples.unionAll(Seq(
      ("o1", "ordered_by", "c1"), ("o2", "ordered_by", "c1"),
      ("o9", "ordered_by", "ghost")).toDF("subj", "pred", "obj"))
    val got = GraphQuery.bgpMatchOptional(tri,
      patterns = Seq(TriplePattern("?c", "in_nation", "?n")),
      optionals = Seq(TriplePattern("?o", "ordered_by", "?c")))
    assert(got.columns.toSeq === Seq("c", "n", "o"))
    assert(got.as[(String, String, Option[String])].collect().toSet === Set(
      ("c1", "de", Some("o1")), ("c1", "de", Some("o2")),
      ("c2", "de", None), ("c3", "fr", None)))
    intercept[IllegalArgumentException] {
      GraphQuery.bgpMatchOptional(tri,
        Seq(TriplePattern("?c", "in_nation", "?n")),
        Seq(TriplePattern("?x", "same_as", "?x")))
    }
  }

  // -------------------------------------------------------------- as-of

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  test("as-of join picks the latest right row at or before each left ts") {
    val left = Seq((1L, "k1", ts(10)), (2L, "k1", ts(20)), (3L, "k1", ts(5)),
      (4L, "k2", ts(100)), (5L, "k3", ts(50)))
      .toDF("id", "k", "ts")
    val right = Seq(("k1", ts(10), 1.0), ("k1", ts(15), 2.0),
      ("k1", ts(21), 9.0), ("k2", ts(99), 7.0))
      .toDF("k", "ts", "v")
    val got = GraphQuery.asOfJoin(left, right, Seq("k"), "ts", Seq("v"))
      .select("id", "r_ts", "r_v").as[(Long, Option[Timestamp], Option[Double])]
      .collect().map { case (id, t, v) => id -> ((t, v)) }.toMap
    // reference semantics row by row: 10 -> inclusive match at 10;
    // 20 -> 15 (21 is future); 5 -> none; k2 100 -> 99; k3 -> no rows
    assert(got === Map(
      1L -> ((Some(ts(10)), Some(1.0))),
      2L -> ((Some(ts(15)), Some(2.0))),
      3L -> ((None, None)),
      4L -> ((Some(ts(99)), Some(7.0))),
      5L -> ((None, None))))
  }

  test("as-of join differential vs a per-row scan on random data") {
    val rng = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (i.toLong, "k" + rng.nextInt(5), ts(rng.nextInt(1000).toLong)))
    val right = rng.shuffle((1 to 200).map(j =>
        ("k" + rng.nextInt(6), ts(j * 5L), j.toDouble)).toList)
      .distinct // unique (k, ts) by construction of ts = j*5
    val got = GraphQuery.asOfJoin(left.toDF("id", "k", "ts"),
        right.toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
      .select("id", "r_v").as[(Long, Option[Double])].collect().toMap
    val want = left.map { case (id, k, t) =>
      val c = right.filter(r => r._1 == k && !r._2.after(t))
      id -> (if (c.isEmpty) None else Some(c.maxBy(_._2.getTime)._3))
    }.toMap
    assert(got === want)
  }

  test("as-of join null keys never match; left row survives with null payload") {
    val left = Seq((1L, null.asInstanceOf[String], ts(10))).toDF("id", "k", "ts")
    val right = Seq((null.asInstanceOf[String], ts(5), 1.0), ("k", ts(5), 2.0))
      .toDF("k", "ts", "v")
    val got = GraphQuery.asOfJoin(left, right, Seq("k"), "ts", Seq("v"))
      .select("id", "r_v").as[(Long, Option[Double])].collect().toSeq
    assert(got === Seq(1L -> None))
  }

  test("as-of join: a null right timestamp is never a phantom match") {
    // the null-ts row would sort nulls-first into every frame; the
    // contract (and the q95 twin's r.ts <= l.ts) says it matches nothing
    val left = Seq((1L, "k", ts(10))).toDF("id", "k", "ts")
    val right = Seq(("k", null.asInstanceOf[Timestamp], 9.0),
      ("k", ts(20), 8.0)).toDF("k", "ts", "v")
    val got = GraphQuery.asOfJoin(left, right, Seq("k"), "ts", Seq("v"))
      .select("id", "r_v").as[(Long, Option[Double])].collect().toSeq
    assert(got === Seq(1L -> None))
  }

  // ------------------------------------------------------------ temporal

  test("validity intervals: change points only, repeats extend, snapshot slices") {
    val obs = Seq(
      ("u1", "city", "berlin", ts(10)),
      ("u1", "city", "berlin", ts(20)), // repeat — no new interval
      ("u1", "city", "paris", ts(30)),
      ("u1", "city", "berlin", ts(40)), // value may recur in a NEW interval
      ("u2", "city", "rome", ts(15))
    ).toDF("subj", "pred", "obj", "ts")
    val iv = GraphQuery.validityIntervals(obs)
    val rows = iv.as[(String, String, String, Timestamp, Option[Timestamp])]
      .collect().toSet
    assert(rows === Set(
      ("u1", "city", "berlin", ts(10), Some(ts(30))),
      ("u1", "city", "paris", ts(30), Some(ts(40))),
      ("u1", "city", "berlin", ts(40), None),
      ("u2", "city", "rome", ts(15), None)))
    assert(GraphQuery.snapshotAt(iv, lit(ts(35)))
      .as[(String, String, String)].collect().toSet ===
      Set(("u1", "city", "paris"), ("u2", "city", "rome")))
    // boundary: inclusive at valid_from, exclusive at valid_to
    assert(GraphQuery.snapshotAt(iv, lit(ts(30)))
      .where(col("subj") === "u1").as[(String, String, String)]
      .collect().toSet === Set(("u1", "city", "paris")))
  }

  test("as-of join plan: one hash exchange, no join operator, no cartesian") {
    val left = Seq((1L, "k", ts(10))).toDF("id", "k", "ts")
    val right = Seq(("k", ts(5), 1.0)).toDF("k", "ts", "v")
    val p = GraphQuery.asOfJoin(left, right, Seq("k"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    // the union-tag/window form: the ONLY wide operator is the window's
    // hash partitioning on the key — a join-shaped plan (range join or
    // worse, a nested loop) would be the scale bug this pins against
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p)
    assert(!p.contains("SortMergeJoin") && !p.contains("HashJoin"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, s"want exactly 1 exchange, plan:\n$p")
  }

  // ----------------------------------------------------------------- rdf

  test("n-triples escaping pinned to hand-written lines") {
    val in = Seq(
      ("a b", "p", "plain"),
      ("s<1>", "p\"q", "say \"hi\"\nline2\tend\\done\r"),
      ("s%", "p", "100% \\"),
      ("s", "p", "")
    ).toDF("subj", "pred", "obj")
    val got = GraphQuery.toNTriples(in, "urn:g/").as[String].collect().toSet
    assert(got === Set(
      "<urn:g/a%20b> <urn:g/p> \"plain\" .",
      "<urn:g/s%3C1%3E> <urn:g/p%22q> \"say \\\"hi\\\"\\nline2\\tend\\\\done\\r\" .",
      "<urn:g/s%25> <urn:g/p> \"100% \\\\\" .",
      "<urn:g/s> <urn:g/p> \"\" ."))
  }
}

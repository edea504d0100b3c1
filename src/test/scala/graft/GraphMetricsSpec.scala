package graft

import java.math.BigDecimal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.GraphMetrics

/** Entity-graph analytics: degree bookkeeping, the exact-decimal PageRank
  * against a driver-local BigDecimal reference, double-vs-exact agreement,
  * layout invariance, and the out-degree guard.
  */
class GraphMetricsSpec extends SparkSpec {

  import spark.implicits._

  // a 2, b 1, c 1, d 1, e 1 out-degree; d and e are pure sources via a/c,
  // b/c/d collect in-edges, the a->..->d->a cycle exercises propagation
  private lazy val edges: DataFrame = Seq(
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "a"), ("e", "c")
  ).toDF("src", "dst").cache()

  /** Driver-local exact reference: same variant, BigDecimal throughout. */
  private def localPageRank(es: Seq[(String, String)], iters: Int): Map[String, BigDecimal] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val outdeg = es.groupBy(_._1).view.mapValues(_.size).toMap
    val d = new BigDecimal("0.85")
    val base = new BigDecimal("0.15")
    var r = nodes.map(_ -> new BigDecimal("1.0")).toMap
    for (_ <- 1 to iters) {
      val in = es.groupBy(_._2)
      r = nodes.map { v =>
        val inflow = in.getOrElse(v, Nil).map { case (u, _) =>
          val w = new BigDecimal(100 / outdeg(u)).movePointLeft(2)
          r(u).multiply(w).multiply(d)
        }.foldLeft(BigDecimal.ZERO)(_.add(_))
        v -> base.add(inflow)
      }.toMap
    }
    r
  }

  test("rankFp15: BIGINT micro-units equal the exact rank shifted 15 places") {
    val exact = GraphMetrics.pageRankExact(edges, iters = 3)
    val fp = GraphMetrics.rankFp15(exact).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = localPageRank(
      Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "a"), ("e", "c")),
      iters = 3)
    for ((n, r) <- ref) {
      // the shift must be EXACT: movePointRight(15) of the true rank is an
      // integer (scale ≤ 13 after 3 supersteps) and rank_fp must equal it
      val shifted = r.movePointRight(15).stripTrailingZeros
      assert(shifted.scale <= 0, s"node $n: true rank has scale > 15")
      assert(fp(n) == shifted.longValueExact, s"node $n: ${fp(n)} vs $shifted")
    }
    assert(GraphMetrics.rankFp15(exact).schema.map(f => (f.name, f.dataType.typeName))
      == Seq(("node", "string"), ("rank_fp", "long")))
  }

  test("degrees: per-direction counts, zero-coalesced sources and sinks") {
    val d = GraphMetrics.degrees(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(d == Map(
      "a" -> ((2L, 1L)), "b" -> ((1L, 1L)), "c" -> ((1L, 3L)),
      "d" -> ((1L, 1L)), "e" -> ((1L, 0L))))
  }

  test("pageRankExact equals the driver-local BigDecimal reference") {
    val ref = localPageRank(
      Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "a"), ("e", "c")),
      iters = 3)
    val got = GraphMetrics.pageRankExact(edges, iters = 3).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(got.keySet == ref.keySet)
    for ((n, r) <- ref)
      assert(got(n).compareTo(r) == 0, s"node $n: ${got(n)} vs $r")
  }

  test("pageRank (double) agrees with the exact mode to float tolerance") {
    val exact = GraphMetrics.pageRankExact(edges, iters = 3).collect()
      .map(r => r.getString(0) -> r.getDecimal(1).doubleValue()).toMap
    val dbl = GraphMetrics.pageRank(edges, iters = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((n, v) <- exact)
      assert(math.abs(dbl(n) - v) < 1e-9, s"node $n: ${dbl(n)} vs $v")
  }

  test("pageRankExact: value-identical under adversarial repartitioning") {
    def run(df: DataFrame): Map[String, BigDecimal] =
      GraphMetrics.pageRankExact(df, iters = 3).collect()
        .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val a = run(edges)
    val b = run(edges.repartition(7, col("dst")))
    assert(a.keySet == b.keySet)
    for ((n, v) <- a) assert(b(n).compareTo(v) == 0)
  }

  test("pageRankExact: checkpoint cadence does not change values") {
    val every = GraphMetrics.pageRankExact(edges, iters = 3, checkpointEvery = 1)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val never = GraphMetrics.pageRankExact(edges, iters = 3, checkpointEvery = 0)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    for ((n, v) <- every) assert(never(n).compareTo(v) == 0)
  }

  test("pageRankExact: raises on an out-degree that has no exact 2-dp weight") {
    val bad = Seq(("x", "p"), ("x", "q"), ("x", "r")).toDF("src", "dst")
    val e = intercept[Exception](GraphMetrics.pageRankExact(bad, 1).collect())
    assert(e.getMessage != null)
    intercept[IllegalArgumentException](GraphMetrics.pageRankExact(edges, 6))
  }

  test("personalized PageRank: seed-gated teleport, zero off-support") {
    // all-nodes seeding degenerates to the standard measure, exactly
    val allNodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val std = GraphMetrics.pageRankExact(edges, 3).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val pprAll = GraphMetrics.personalizedPageRankExact(edges, allNodes, 3)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(std.keySet == pprAll.keySet)
    for ((n, v) <- std) assert(pprAll(n).compareTo(v) == 0, n)
    // seed only e: e holds exactly the teleport 0.15 (no in-edges), c is
    // reached, and b — four hops from e — is EXACTLY zero at 3 supersteps
    val ppr = GraphMetrics.personalizedPageRankExact(
      edges, Seq("e").toDF("node"), 3)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(ppr("e").compareTo(new BigDecimal("0.15")) == 0)
    assert(ppr("c").signum() > 0)
    assert(ppr("b").signum() == 0, s"off-support must be exact zero: ${ppr("b")}")
  }

  test("personalized PageRank: double mode honors the same seed gate") {
    val ppr = GraphMetrics.pageRank(edges, iters = 3,
        seeds = Some(Seq("e").toDF("node")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // base = 1.0 - 0.85 in double is 0.15000000000000002 — the float
    // imprecision the exact mode exists to avoid; off-support stays an
    // exact 0.0 even in double mode (0 * anything + 0)
    assert(math.abs(ppr("e") - 0.15) < 1e-15 && ppr("b") == 0.0,
      s"seed gate broken: $ppr")
    val exact = GraphMetrics.personalizedPageRankExact(
      edges, Seq("e").toDF("node"), 3)
      .collect().map(r => r.getString(0) -> r.getDecimal(1).doubleValue()).toMap
    for ((n, v) <- exact) assert(math.abs(ppr(n) - v) < 1e-9, n)
  }

  test("minHops: multi-source min distance, unreachable absent, early drain") {
    // chain v0->v1->...->v5 plus a shortcut s->v3 and an island x->y
    val chain = (0 until 5).map(i => (s"v$i", s"v${i + 1}")) ++
      Seq(("s", "v3"), ("x", "y"))
    val e = chain.toDF("src", "dst")
    val seeds = Seq("v0", "s").toDF("node")
    val got = GraphMetrics.minHops(e, seeds, maxHops = 10).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    // v3 is 3 hops from v0 but 1 from s — min wins; island unreachable
    assert(got == Map("v0" -> 0, "s" -> 0, "v1" -> 1, "v2" -> 2,
      "v3" -> 1, "v4" -> 2, "v5" -> 3))
    // maxHops truncates the frontier
    val cut = GraphMetrics.minHops(e, seeds, maxHops = 1).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(cut == Map("v0" -> 0, "s" -> 0, "v1" -> 1, "v3" -> 1))
  }

  test("minHops: layout-invariant and cycle-safe") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    def run(df: DataFrame): Map[String, Int] =
      GraphMetrics.minHops(df, seeds, maxHops = 50).collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
    // the cycle must not loop past the labeled set (terminates well
    // before maxHops via the drained frontier)
    assert(run(e) == Map("a" -> 0, "b" -> 1, "c" -> 2))
    assert(run(e.repartition(5, col("src"))) == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("randomWalks: valid contiguous walks, deterministic, die at sinks") {
    val walks = GraphMetrics.randomWalks(edges, length = 6, salt = "t")
    val rows = walks.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val edgeSet = Set(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
      ("d", "a"), ("e", "c"))
    val byWalk = rows.groupBy(_._1)
    assert(byWalk.keySet == Set("a", "b", "c", "d", "e"))
    for ((w, steps) <- byWalk) {
      val path = steps.sortBy(_._2)
      assert(path.head == ((w, 0, w)), "step 0 is the start node")
      assert(path.map(_._2).toSeq == path.indices.toList, "steps are contiguous")
      path.sliding(2).foreach {
        case Array((_, _, u), (_, _, v)) =>
          assert(edgeSet((u, v)), s"walk $w took a non-edge $u->$v")
        case _ =>
      }
    }
    // every node here has out-degree >= 1, so all walks run full length
    assert(byWalk.values.forall(_.length == 7))
    // a sink stops its walk: remove d->a and d's walk ends on arrival
    val cut = GraphMetrics.randomWalks(
      edges.filter(!(col("src") === "d")), length = 6, salt = "t").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val dWalk = cut.filter(_._1 == "d").sortBy(_._2)
    assert(dWalk.toList == List(("d", 0, "d")), "sink start emits only step 0")
    // determinism under layout; a different salt gives different walks
    val again = GraphMetrics.randomWalks(
      edges.repartition(5, col("dst")), length = 6, salt = "t").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(again.toSet == rows.toSet)
    val other = GraphMetrics.randomWalks(edges, length = 6, salt = "u")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(other.toSet != rows.toSet)
  }

  test("triangles: exact per-node counts, once per triangle, noise-proof") {
    // K4 on {a,b,c,d} (4 triangles, 3 per node) plus a pendant edge and
    // noise: duplicates, reversed orientation, a self-loop
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"))
    val noisy = (k4 ++ Seq(("b", "a"), ("c", "a"), ("a", "b"),
      ("d", "e"), ("e", "e"))).toDF("src", "dst")
    val got = GraphMetrics.triangles(noisy).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L),
      s"got $got")
    // triangle-free graph: empty result, and layout invariance
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    assert(GraphMetrics.triangles(path).count() == 0)
    val again = GraphMetrics.triangles(noisy.repartition(5, col("dst")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("commonNeighbors: non-adjacent pairs only, exact counts, hub cap") {
    // square a-b-c-d-a: (a,c) and (b,d) are the diagonals with 2 common
    // neighbors each; adjacent pairs must be absent
    val sq = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val got = GraphMetrics.commonNeighbors(sq).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "c") -> 2L, ("b", "d") -> 2L))
    // a hub center above the cap generates no wedges: star graph
    val star = (0 until 5).map(i => ("hub", s"leaf$i")).toDF("src", "dst")
    assert(GraphMetrics.commonNeighbors(star, hubCap = 4).count() == 0)
    val viaHub = GraphMetrics.commonNeighbors(star, hubCap = 5).collect()
    assert(viaHub.length == 10 && viaHub.forall(_.getLong(2) == 1L))
    // adjacency exclusion pinned NON-vacuously: in K3 every adjacent
    // pair shares a common neighbor, so a broken anti-join would emit 3
    // rows; the correct result is empty
    val k3 = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    assert(GraphMetrics.commonNeighbors(k3).count() == 0,
      "existing edges must never be predicted")
  }

  test("triangles + commonNeighbors match brute force on hash-random graphs") {
    // deterministic "random" graphs: edge (i, j) present iff
    // md5-derived bit — no RNG state, reproducible across runs
    for (seed <- Seq("g1", "g2", "g3")) {
      val n = 12
      val all = for {
        i <- 0 until n; j <- i + 1 until n
        if java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed:$i:$j".getBytes("UTF-8"))(0) % 4 == 0
      } yield (s"n$i", s"n$j")
      val df = all.toDF("src", "dst")
      val adj = all.toSet
      def linked(a: String, b: String) = adj((a, b)) || adj((b, a))
      val nodes = (0 until n).map(i => s"n$i")
      // brute-force per-node triangle counts
      val bruteTri = nodes.map { v =>
        v -> (for {
          u <- nodes; w <- nodes
          if u < w && u != v && w != v
          if linked(u, v) && linked(v, w) && linked(u, w)
        } yield 1).size.toLong
      }.filter(_._2 > 0).toMap
      val gotTri = GraphMetrics.triangles(df).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(gotTri == bruteTri, s"seed $seed: $gotTri vs $bruteTri")
      // brute-force common-neighbor counts for non-adjacent pairs
      val bruteCn = (for {
        a <- nodes; b <- nodes
        if a < b && !linked(a, b)
        c = nodes.count(x => x != a && x != b && linked(a, x) && linked(b, x))
        if c >= 1
      } yield (a, b) -> c.toLong).toMap
      val gotCn = GraphMetrics.commonNeighbors(df).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(gotCn == bruteCn, s"seed $seed: $gotCn vs $bruteCn")
    }
  }

  test("pageRank: no-in-edge nodes sit at the base rank, all ranks >= base") {
    val r = GraphMetrics.pageRank(edges, iters = 4).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("e") - 0.15) < 1e-12, "pure source must hold 1 - d")
    assert(r.values.forall(_ >= 0.15 - 1e-12))
  }

  test("applyDegreeChanges: folded feed == full recompute; unknown type raises") {
    def degMap(df: DataFrame): Map[String, (Long, Long)] =
      df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val before = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("x", "y"))
      .toDF("src", "dst")
    // insert (c,d); delete (a,b); rewire (b,c)->(b,d); delete x's only edge
    val changes = Seq(
      ("c", "d", "insert"), ("a", "b", "delete"),
      ("b", "c", "update_preimage"), ("b", "d", "update_postimage"),
      ("x", "y", "delete")
    ).toDF("src", "dst", "_change_type")
    val after = Seq(("a", "c"), ("b", "d"), ("c", "d")).toDF("src", "dst")
    val got = GraphMetrics.applyDegreeChanges(GraphMetrics.degrees(before), changes)
    assert(degMap(got) === degMap(GraphMetrics.degrees(after)))
    assert(!degMap(got).contains("x") && !degMap(got).contains("y"),
      "fully-unwound nodes must drop out")
    val bad = Seq(("a", "b", "upsert")).toDF("src", "dst", "_change_type")
    val e = intercept[Exception] {
      GraphMetrics.applyDegreeChanges(GraphMetrics.degrees(before), bad).collect()
    }
    assert(e.getMessage != null || e.getCause != null) // raised, not skipped
  }

  test("minCost: bounded Bellman-Ford vs a driver-local reference") {
    // diamond with a tempting long-but-cheap path: s->a->b->t costs 3,
    // s->t direct costs 10; plus a cycle and an unreachable island
    val es = Seq(("s", "a", 1L), ("a", "b", 1L), ("b", "t", 1L),
      ("s", "t", 10L), ("t", "s", 1L), ("x", "y", 2L))
    val df = es.toDF("src", "dst", "w")
    val seeds = Seq("s").toDF("node")
    def local(iters: Int): Map[String, Long] = {
      var dist = Map("s" -> 0L)
      for (_ <- 1 to iters)
        dist = (dist.toSeq ++ es.flatMap { case (u, v, w) =>
          dist.get(u).map(c => v -> (c + w))
        }).groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      dist
    }
    for (it <- 1 to 4) {
      val got = GraphMetrics.minCost(df, seeds, it).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === local(it), s"iters=$it")
    }
    val g4 = GraphMetrics.minCost(df, seeds, 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g4 === Map("s" -> 0L, "a" -> 1L, "b" -> 2L, "t" -> 3L))
    assert(!g4.contains("x") && !g4.contains("y"), "island must be absent")
  }

  /** Driver-local reference for the synchronous min-tie LPA. */
  private def localLpa(es: Seq[(String, String)], iters: Int): Map[String, String] = {
    val und = es ++ es.map(e => (e._2, e._1))
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labels = adj.map { case (n, nbrs) =>
        n -> nbrs.groupBy(labels).view.mapValues(_.size).toSeq
          .minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  private def lpaMap(df: DataFrame): Map[String, String] =
    df.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("labelPropagation: barbell graph converges to two communities") {
    val k4 = (p: String) => for {
      i <- 0 to 3; j <- 0 to 3 if i < j
    } yield (s"$p$i", s"$p$j")
    val es = k4("a") ++ k4("b") :+ (("a0", "b0"))
    val df = es.toDF("src", "dst")
    for (it <- 1 to 3)
      assert(lpaMap(GraphMetrics.labelPropagation(df, it)) === localLpa(es, it),
        s"iters=$it")
    val l3 = lpaMap(GraphMetrics.labelPropagation(df, 3))
    assert(l3.filterKeys(_.startsWith("a")).values.toSet.size === 1)
    assert(l3.filterKeys(_.startsWith("b")).values.toSet.size === 1)
    assert(l3("a1") !== l3("b1"), "bridge must not merge the clusters")
  }

  test("labelPropagation differential vs brute force on random graphs") {
    for (seed <- Seq(11, 22, 33)) {
      val rng = new scala.util.Random(seed)
      val nodes = (0 until 24).map(i => f"v$i%02d")
      val es = (1 to 50).map(_ =>
        (nodes(rng.nextInt(nodes.size)), nodes(rng.nextInt(nodes.size))))
        .filter(e => e._1 != e._2).distinct
      val df = es.toDF("src", "dst")
      for (it <- Seq(1, 3))
        assert(lpaMap(GraphMetrics.labelPropagation(df, it)) === localLpa(es, it),
          s"seed=$seed iters=$it")
    }
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

import graft.functions.TokenJaccardFunctions.token_jaccard
import graft.operators.Dedup
import graft.rules.{Rules, SkillCluster}

/** The Catalyst extension surface: TokenJaccardExpr vs its composed-Column
  * twin, the similarity-join rewrite (plan shape + value equivalence +
  * guard conditions), and the SQL function registry.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("id", "text")
      .select(col("id"), Dedup.wordShingles(col("text"), 2).as("sh"))

  /** Quadratic physical join (cartesian / nested-loop) anywhere in the
    * executed plan — pushdown folds cross-side predicates into the join
    * CONDITION, so the logical `Join(…, None)` shape is not a reliable
    * detector; the physical operator choice is.
    */
  private def hasQuadraticJoin(df: DataFrame): Boolean = {
    val s = df.queryExecution.executedPlan.toString
    s.contains("CartesianProduct") || s.contains("BroadcastNestedLoopJoin")
  }

  private def hasAggregate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.nonEmpty

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over a sleepy dog",
    3L -> "pack my box with five dozen liquor jugs",
    4L -> "pack my box with five dozen liquor mugs",
    5L -> "entirely different text about spark catalyst rules",
    6L -> "")

  test("token_jaccard expression == composed array_intersect/array_union twin") {
    val pairs = docs(corpus: _*).as("a").crossJoin(docs(corpus: _*).as("b"))
      .select(
        token_jaccard(col("a.sh"), col("b.sh")).as("native"),
        Dedup.jaccard(col("a.sh"), col("b.sh")).as("twin"))
    assert(pairs.filter(col("native") =!= col("twin")).count() == 0)
    // duplicates inside the arrays collapse to set semantics on both sides
    val dup = Seq((Seq("x", "x", "y"), Seq("y", "y", "z"))).toDF("a", "b")
      .select(token_jaccard(col("a"), col("b")).as("j")).as[Double].head()
    assert(dup == 1.0 / 3.0)
    // null input propagates
    val nul = Seq((Some(Seq("x")), Option.empty[Seq[String]])).toDF("a", "b")
      .select(token_jaccard(col("a"), col("b")).as("j")).filter(col("j").isNull)
    assert(nul.count() == 1)
  }

  test("similarity-join rewrite: cross join disappears, values are exact") {
    val d = docs(corpus: _*)
    val declarative = d.as("a").crossJoin(d.as("b"))
      .filter(token_jaccard(col("a.sh"), col("b.sh")) >= 0.3 &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    assert(!hasQuadraticJoin(declarative), "cross join survived the rewrite")
    assert(hasAggregate(declarative), "no inverted-index aggregate in the plan")

    // independent twin: the composed-Column form contains no
    // TokenJaccardExpr, so the rule leaves its cartesian alone
    val naive = d.as("a").crossJoin(d.as("b"))
      .filter(Dedup.jaccard(col("a.sh"), col("b.sh")) >= 0.3 &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    assert(hasQuadraticJoin(naive))
    assert(declarative.collect().toSet == naive.collect().toSet)
    assert(declarative.count() > 0, "fixture produced no similar pairs")
  }

  test("rewrite preserves row multiplicity (duplicate input rows)") {
    val base = corpus ++ Seq(1L -> corpus.head._2) // row 1 appears twice
    val d = docs(base: _*)
    val declarative = d.as("a").crossJoin(d.as("b"))
      .filter(token_jaccard(col("a.sh"), col("b.sh")) >= 0.9)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val naive = d.as("a").crossJoin(d.as("b"))
      .filter(Dedup.jaccard(col("a.sh"), col("b.sh")) >= 0.9)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    assert(!hasQuadraticJoin(declarative))
    val got = declarative.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want)
    // the duplicated doc pairs with itself twice in each direction
    assert(got.count(_ == (1L, 1L)) == 4)
  }

  test("rewrite boundary semantics: >= keeps the exact-threshold pair, > drops it") {
    val a = Seq(10L -> "x y z", 20L -> "y z w")
    // 2-shingles: {x y, y z} vs {y z, z w} -> shared 1, union 3 -> jac exactly 1/3
    val d = docs(a: _*)
    def q(pred: org.apache.spark.sql.Column) =
      d.as("a").crossJoin(d.as("b"))
        .filter(pred && col("a.id") < col("b.id")).count()
    val j = token_jaccard(col("a.sh"), col("b.sh"))
    assert(q(j >= (1.0 / 3.0)) == 1)
    assert(q(j > (1.0 / 3.0)) == 0)
    // flipped literal-first form also rewrites and agrees
    val flipped = d.as("a").crossJoin(d.as("b"))
      .filter(lit(1.0 / 3.0) <= token_jaccard(col("a.sh"), col("b.sh")) &&
        col("a.id") < col("b.id"))
    assert(!hasQuadraticJoin(flipped))
    assert(flipped.count() == 1)
  }

  test("rewrite guard: threshold <= 0 keeps the cartesian (token-disjoint pairs qualify)") {
    val d = docs(corpus: _*)
    val zero = d.as("a").crossJoin(d.as("b"))
      .filter(token_jaccard(col("a.sh"), col("b.sh")) >= 0.0)
    assert(hasQuadraticJoin(zero), "t=0 must NOT be rewritten")
    // every pair qualifies at t=0, including the empty-text doc
    assert(zero.count() == corpus.length.toLong * corpus.length)
  }

  test("nondeterministic conjunct: analyzer pulls it above, rewrite still fires correctly") {
    val d = docs(corpus: _*)
    // rand(7) < 2.0 is always true but nondeterministic — the ANALYZER
    // (PullOutNondeterministic) lifts it out of the filter before the
    // optimizer runs, so the rule sees only the deterministic residue and
    // fires; the in-rule determinism guard is defense-in-depth for
    // manually-constructed plans. Values must match the quadratic twin.
    val nd = d.as("a").crossJoin(d.as("b"))
      .filter(token_jaccard(col("a.sh"), col("b.sh")) >= 0.3 &&
        rand(7) < 2.0 && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    assert(!hasQuadraticJoin(nd))
    val naive = d.as("a").crossJoin(d.as("b"))
      .filter(Dedup.jaccard(col("a.sh"), col("b.sh")) >= 0.3 &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    assert(nd.collect().toSet == naive.collect().toSet)
  }

  test("map-typed (ungroupable) output columns survive the rewrite via First carry") {
    val d = docs(corpus: _*)
    val withMap = d.withColumn("m", map(lit("k"), col("id")))
    // maps are not groupable, but the rewrite groups by the row-id pair
    // only and carries every other column as a First(...) aggregate — so
    // a map column in the join output is fine and the rewrite still fires
    val q = withMap.as("a").crossJoin(d.as("b"))
      .filter(token_jaccard(col("a.sh"), col("b.sh")) >= 0.3 &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.m"))
    assert(!hasQuadraticJoin(q))
    val naive = withMap.as("a").crossJoin(d.as("b"))
      .filter(Dedup.jaccard(col("a.sh"), col("b.sh")) >= 0.3 &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.m"))
    def rows(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getMap[String, Long](2).toMap)).toSet
    assert(rows(q) == rows(naive))
  }

  test("rewrite handles swapped operand orientation (right-side expr first)") {
    val d = docs(corpus: _*)
    val swapped = d.as("a").crossJoin(d.as("b"))
      .filter(token_jaccard(col("b.sh"), col("a.sh")) >= 0.3 &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val naive = d.as("a").crossJoin(d.as("b"))
      .filter(Dedup.jaccard(col("a.sh"), col("b.sh")) >= 0.3 &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    assert(!hasQuadraticJoin(swapped))
    assert(swapped.collect().toSet == naive.collect().toSet)
  }

  test("length filter is float-safe: exact-boundary containment pair survives") {
    // |distinct(a)| = 7 ⊂ |distinct(b)| = 25 → jac = 7/25 = fl(0.28); the
    // multiplication form fl(0.28·25.0) = 7.000000000000001 > 7 would
    // wrongly prune this pair — the division-form filter must keep it
    val wa = (1 to 7).map(i => s"w$i")
    val wb = (1 to 7).map(i => s"w$i") ++ (1 to 18).map(i => s"x$i")
    val d = Seq((1L, wa.mkString(" ")), (2L, wb.mkString(" "))).toDF("id", "text")
      .select(col("id"), Dedup.wordShingles(col("text"), 1).as("sh"))
    val q = d.as("a").crossJoin(d.as("b"))
      .filter(token_jaccard(col("a.sh"), col("b.sh")) >= 0.28 &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    assert(!hasQuadraticJoin(q), "rewrite must fire")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("rewrite guard: a cross-side equi conjunct keeps the cheap hash join") {
    // grp === grp makes the alternative a hash equi-join with jaccard as a
    // residual — demoting it to a whole-table token join would be a
    // regression, so the rule must not fire (no Aggregate in the plan)
    val d = docs(corpus: _*).withColumn("grp", col("id") % 2)
    val q = d.as("a").join(d.as("b"),
        col("a.grp") === col("b.grp") &&
          token_jaccard(col("a.sh"), col("b.sh")) >= 0.3 &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    assert(!hasAggregate(q), "equi-join query must not be rewritten")
    assert(!hasQuadraticJoin(q), "and it plans as a hash/sort-merge join")
    val naive = d.as("a").join(d.as("b"),
        col("a.grp") === col("b.grp") &&
          Dedup.jaccard(col("a.sh"), col("b.sh")) >= 0.3 &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    assert(q.collect().toSet == naive.collect().toSet)
  }

  test("randomized differential: rewrite == quadratic on seeded corpora and thresholds") {
    val rnd = new scala.util.Random(99)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    for (trial <- 0 until 4) {
      val n = 12 + rnd.nextInt(12)
      val rows = (0 until n).map { i =>
        val len = 1 + rnd.nextInt(8)
        (i.toLong, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      // duplicate a couple of rows to keep multiplicity in play
      val d = docs(rows ++ rows.take(2): _*)
      // thresholds include small-denominator rationals that land exactly on
      // attainable jaccard values (the float-boundary class)
      for (t <- Seq(0.2, 1.0 / 3.0, 0.5, 0.25 + rnd.nextDouble() * 0.5)) {
        val declarative = d.as("a").crossJoin(d.as("b"))
          .filter(token_jaccard(col("a.sh"), col("b.sh")) >= t &&
            col("a.id") <= col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        val naive = d.as("a").crossJoin(d.as("b"))
          .filter(Dedup.jaccard(col("a.sh"), col("b.sh")) >= t &&
            col("a.id") <= col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        assert(!hasQuadraticJoin(declarative), s"trial $trial t=$t: no rewrite")
        val got = declarative.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        val want = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got == want, s"trial $trial t=$t diverged")
      }
    }
  }

  test("SQL registry: NULL literals evaluate to NULL like builtin functions") {
    assert(spark.sql("SELECT graft_clean_string(NULL) AS c").head().isNullAt(0))
    assert(spark.sql("SELECT graft_word_shingles(NULL, 2) AS s").head().isNullAt(0))
    assert(spark.sql("SELECT graft_filter_skills_dbscan(NULL) AS k").head().isNullAt(0))
    assert(spark.sql("SELECT graft_token_jaccard(NULL, array('a')) AS j").head().isNullAt(0))
  }

  test("SQL registry rejects wrong input types at analysis") {
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_filter_skills_dbscan(array(1, 2, 3))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_word_shingles(array('a'), 2)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_token_jaccard(array('a'), 'b')").collect()
    }
  }

  test("SQL registry: graft_* functions run through spark.sql") {
    val j = spark.sql("SELECT graft_token_jaccard(array('a','b'), array('b','c')) AS j")
      .as[Double].head()
    assert(j == 1.0 / 3.0)

    val txt = "We Offer a Salary of 45,000 € per year!  Full Time <b>position</b>."
    val viaSql = spark.sql(s"SELECT graft_clean_string('${txt.replace("'", "''")}') AS c")
      .as[String].head()
    assert(viaSql == Rules.cleanString(txt))

    val sh = spark.sql("SELECT graft_word_shingles('a b c d', 2) AS s")
      .as[Seq[String]].head()
    assert(sh == Seq("a b", "b c", "c d"))

    val skills = graft.sources.Dims.occupationByIsco("251").essential
    val inList = skills.map(s => s"'${s.replace("'", "''")}'").mkString(",")
    val kept = spark.sql(s"SELECT graft_filter_skills_dbscan(array($inList)) AS k")
      .as[Seq[String]].head()
    assert(kept == SkillCluster.filterSkills(skills))
  }

  test("SQL similarity join through spark.sql is rewritten too") {
    docs(corpus: _*).createOrReplaceTempView("ext_docs")
    val df = spark.sql(
      """SELECT a.id AS id_a, b.id AS id_b
        |FROM ext_docs a CROSS JOIN ext_docs b
        |WHERE graft_token_jaccard(a.sh, b.sh) >= 0.3 AND a.id < b.id""".stripMargin)
    assert(!hasQuadraticJoin(df))
    assert(df.count() > 0)
  }
}

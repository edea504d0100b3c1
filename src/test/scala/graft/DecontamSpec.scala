package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Decontam

/** Decontamination vs an eval set: contamination = fraction of a doc's
  * distinct k-word shingles present in the eval vocabulary. Pinned three
  * ways: hand-computed fixtures, a plain-Scala differential over fuzzed
  * corpora (same tokenization re-derived independently), and plan-shape
  * (broadcast vs shuffle twins agree; nothing quadratic).
  */
class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("exact eval copies are fully contaminated; disjoint docs are clean") {
    val train = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "completely unrelated sentence about spark catalyst plans",
      3L -> "THE QUICK BROWN fox jumps over the lazy dog") // case-folded copy
    val evalSet = docs(100L -> "the quick brown fox jumps over the lazy dog")
    val rep = Decontam.contamination(train, evalSet.select("text"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("contamination")).toMap
    assert(rep(1L) == 1.0 && rep(3L) == 1.0, "copies must be fully contaminated")
    assert(rep(2L) == 0.0, "disjoint docs must be clean")
    val kept = Decontam.decontaminate(train, evalSet.select("text"), k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("partial overlap counts distinct shingles, hand-computed") {
    // k=2 shingles of doc: {a b, b c, c d} (distinct); eval contains "b c"
    // and "c d" via its own text → 2/3
    val train = docs(1L -> "a b c d")
    val evalSet = docs(100L -> "x b c d y")
    val r = Decontam.contamination(train, evalSet.select("text"), k = 2)
      .collect()(0)
    assert(r.getAs[Long]("n_shingles") == 3L)
    assert(r.getAs[Long]("n_hits") == 2L)
    assert(math.abs(r.getAs[Double]("contamination") - 2.0 / 3.0) < 1e-12)
  }

  test("repeated shingles in a doc count once (distinct semantics)") {
    val train = docs(1L -> "spam spam spam spam spam")
    val evalSet = docs(100L -> "spam spam")
    val r = Decontam.contamination(train, evalSet.select("text"), k = 2)
      .collect()(0)
    // all 4 positional 2-grams are "spam spam" → 1 distinct, 1 hit
    assert(r.getAs[Long]("n_shingles") == 1L && r.getAs[Long]("n_hits") == 1L)
    assert(r.getAs[Double]("contamination") == 1.0)
  }

  test("differential vs an independent plain-Scala re-derivation (fuzzed)") {
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val rnd = new scala.util.Random(42)
    def sentence(n: Int) = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val train = (1L to 60L).map(i => (i, sentence(3 + rnd.nextInt(10))))
    val evalTexts = (1 to 8).map(_ => sentence(5 + rnd.nextInt(8)))
    val k = 3
    // independent re-derivation: positional k-grams over a lowercase
    // whitespace split, distinct per doc
    def shingles(t: String): Set[String] = {
      val toks = t.toLowerCase.split("\\s+")
      (0 to math.max(toks.length - k, 0))
        .map(i => toks.slice(i, i + k).mkString(" ")).toSet
    }
    val vocab = evalTexts.flatMap(shingles).toSet
    val expected = train.map { case (id, t) =>
      val sh = shingles(t)
      id -> ((sh.size.toLong, sh.count(vocab).toLong))
    }.toMap
    val got = Decontam.contamination(
        train.toDF("doc_id", "text"), evalTexts.map(Tuple1(_)).toDF("text"), k = k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hits"))))
      .toMap
    assert(got == expected)
  }

  test("broadcast and shuffle paths agree; neither plans a cartesian") {
    val train = (1L to 40L).map(i => (i, s"w$i w${i + 1} w${i + 2} w${i + 3}"))
      .toDF("doc_id", "text")
    val evalSet = (20 to 25).map(i => Tuple1(s"w$i w${i + 1} w${i + 2}")).toDF("text")
    val a = Decontam.contamination(train, evalSet, k = 2, broadcastEval = true)
    val b = Decontam.contamination(train, evalSet, k = 2, broadcastEval = false)
    assert(a.orderBy("doc_id").collect().toSeq == b.orderBy("doc_id").collect().toSeq)
    Seq(a, b).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"decontamination must never go quadratic:\n$plan")
    }
    assert(a.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "the small eval vocabulary must ride a broadcast join")
  }

  test("decontaminate with a tolerance keeps partially-overlapping docs") {
    val train = docs(
      1L -> "p q r s t u v w x y",  // no overlap
      2L -> "a b c d x1 x2 x3 x4 x5 x6") // shares one shingle with eval
    val evalSet = docs(100L -> "a b c d")
    val strict = Decontam.decontaminate(train, evalSet.select("text"), k = 4)
    assert(strict.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
    val lax = Decontam.decontaminate(train, evalSet.select("text"), k = 4,
      maxContamination = 0.5)
    assert(lax.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }
}

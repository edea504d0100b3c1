package graft

import org.apache.spark.sql.functions._

import graft.functions.RepetitionEvals
import graft.operators.TextAnalysis
import org.apache.spark.unsafe.types.UTF8String

/** Repetition signals (Gopher quality filters): hand-computed edges, a
  * randomized differential pin of the single-pass scanner against the
  * Scala-collections reference, and the DataFrame surface.
  */
class RepetitionSpec extends SparkSpec {

  private def fast(s: String): (Long, Double, Double, Double, Double, Double) = {
    val r = RepetitionEvals.stats(UTF8String.fromString(s))
    (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5))
  }

  test("hand-computed edges") {
    // empty / whitespace-only: all zeros
    assert(fast("") == ((0L, 0.0, 0.0, 0.0, 0.0, 0.0)))
    assert(fast(" \t\n") == ((0L, 0.0, 0.0, 0.0, 0.0, 0.0)))
    // single word: no grams
    assert(fast("hello") == ((1L, 0.0, 0.0, 0.0, 0.0, 0.0)))
    // "a b a b": 4 words, 2 distinct -> dup_word 0.5; top-2-gram "a b"
    // occurs 2x covering 2 chars each over tc=4 -> 1.0; "b a" 1x.
    val (nw, dw, t2, t3, t4, d5) = fast("a b a b")
    assert(nw == 4 && dw == 0.5 && t2 == 1.0)
    // top-3 "a b a" (1x, 3 chars of 4); no 5-grams duplicated
    assert(t3 == 0.75 && t4 == 1.0 && d5 == 0.0)
    // all-same word: overlapping occurrences push count*chars past 1.0
    // (the reference implementations' semantics — see the scaladoc); the
    // position-union dup5 stays a true fraction
    val all = fast("x x x x x x x x x x")
    assert(all == ((10L, 0.9, 9 * 2 / 10.0, 8 * 3 / 10.0, 7 * 4 / 10.0, 1.0)))
    // duplicated 5-gram with position-union: "a b c d e a b c d e f"
    // 5-gram "a b c d e" occurs 2x -> covers positions 0-4 and 5-9 (10 of
    // 11 words, 10 of 11 chars)
    val (_, _, _, _, _, dup) = fast("a b c d e a b c d e f")
    assert(math.abs(dup - 10.0 / 11.0) < 1e-12)
    // case folding: tokens compare lowercased
    assert(fast("Foo foo FOO")._2 == 2.0 / 3.0)
    // tie on count -> lexicographically smallest gram wins (both "b a" and
    // "a b" occur once in "b a b"? no: "b a" 1x, "a b" 1x -> tie, "a b"
    // chosen; both cover 2 chars of 3 -> same frac either way, so pin a
    // case where char coverage differs: "bb a a bb" — "a a" vs "a bb" vs
    // "bb a" all 1x; smallest key "a a" covers 2 chars of 6
    assert(fast("bb a a bb")._3 == 2.0 / 6.0)
  }

  test("fuzz: scanner == Scala-collections reference (3000 cases)") {
    val rnd = new scala.util.Random(74)
    val vocab = Vector("a", "b", "ab", "the", "data", "spark", "Row", "X",
      "über", "0", "1", "12", "!", "a-b")
    val seps = Vector(" ", "  ", "\t", "\n", "", "\f", "\r", " \t ")
    (1 to 3000).foreach { _ =>
      val n = rnd.nextInt(30)
      val sb = new StringBuilder()
      if (rnd.nextBoolean()) sb.append(seps(rnd.nextInt(seps.size)))
      (1 to n).foreach { i =>
        sb.append(vocab(rnd.nextInt(rnd.nextInt(vocab.size) + 1)))
        if (i < n || rnd.nextBoolean()) sb.append(seps(rnd.nextInt(seps.size)))
      }
      val s = sb.toString
      assert(fast(s) == RepetitionEvals.statsRef(s), s"input: ${s.take(120)}")
    }
  }

  test("DataFrame surface: struct schema, null text, filter gate") {
    import spark.implicits._
    // d2: 30 distinct words — with all-unique grams the top-n fraction is
    // ~n/n_words, so a doc must be this long to clear the Gopher cuts
    // (short docs always trip them; the paper also length-gates first)
    val d2text = (1 to 30).map(i => s"w$i").mkString(" ")
    val df = Seq(("d1", "a b a b a b a b"), ("d2", d2text),
      ("d3", null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextAnalysis.repetitionStats(col("text")).as("r"))
    assert(out.schema("r").dataType == RepetitionEvals.schema)
    val rows = out.selectExpr("doc_id", "r.top2_char_frac").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(rows("d1").contains(1.0))
    assert(rows("d3").isEmpty, "null text must stay null, not crash")
    // the Gopher gate drops the saturated doc and keeps the clean one
    val kept = TextAnalysis.repetitionFilter(df.filter(col("text").isNotNull),
      col("text")).select("doc_id").as[String].collect().toSet
    assert(kept == Set("d2"))
  }

  test("plan: narrow (no shuffle), codegen'd") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docs.select(TextAnalysis.repetitionStats(col("text")).as("r"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "repetition scan must not shuffle")
    // `*(n)` prefix = the projection sits inside a whole-stage-codegen span
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("repetition_stats")),
      plan.take(1500))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.LangEvals
import graft.operators.TextAnalysis

/** Differential pins for the LangExprs one-pass kernels: langId,
  * langIdTrigram and qualityScore must agree with their Column twins
  * (which tokenize via the regex StringSplit the natives replaced) on
  * marker-rich seeded fuzz, tie cases, CJK gates, and empty-token
  * structure — through the DataFrame codegen path and via direct
  * interpreted eval on the SAME lowering Spark applies
  * (UTF8String.toLowerCase).
  */
class LangScanSpec extends SparkSpec {

  private val edges = Seq(
    "", " ", "  ", "the", "THE AND OF", "der die und", "le la et",
    "el los las", "the der le el", "the the the der der",
    "und ist, das", "for 中 text", "中文", "the 😀 and", "a\tb the",
    "is  with   for", " the ", "xyz qqq zzz", "123 456 78",
    "the quick brown fox jumps with everything for now",
    "das ist nicht der einzige weg mit allem",
    "les des une que grande aventure pour tous",
    "los las una para por el gato grande",
    "schreiben ich mochte nicht", "question ancient entire nation",
    // '-cion-' text: "cio" (es) and "ion" (en) windows both fire; "par"
    // tips it to es — the case the 4-char "cion" entry used to lose
    "informacion para la poblacion", "nacional atencion",
    "1 22 333 4444 the 55", "a a a a a a a a", "to to to to is")

  private def fuzz: Seq[String] = {
    val rnd = new scala.util.Random(1234)
    val words: IndexedSeq[String] =
      LangEvals.markers.flatMap(_._2).toIndexedSeq ++
        LangEvals.qualityStopwords ++
        Seq("xyz", "qqq", "123", "45", "a1", "grande", "schreiben", "nation",
          "中", "😀", ".", "-", "x\ty", "", "THE", "Der", "ancient", "pour",
          // '-cion-' words: their windows include BOTH es "cio" and en
          // "ion" — pins the cross-language overlap handling
          "nacional", "atencion")
    (0 until 400).map { _ =>
      val n = rnd.nextInt(13)
      (0 until n).map(_ => words(rnd.nextInt(words.length)))
        .mkString(if (rnd.nextInt(5) == 0) "  " else " ")
    }
  }

  private def corpus: Seq[String] = (edges ++ fuzz).distinct

  test("native lang/quality kernels == Column twins (codegen path)") {
    import spark.implicits._
    val rows = corpus.toDF("text")
      .select(col("text"),
        TextAnalysis.langId(col("text")).as("lid_n"),
        TextAnalysis.langIdColumn(col("text")).as("lid_c"),
        TextAnalysis.langIdTrigram(col("text")).as("tri_n"),
        TextAnalysis.langIdTrigramColumn(col("text")).as("tri_c"),
        TextAnalysis.qualityScore(col("text")).as("q_n"),
        TextAnalysis.qualityScoreColumn(col("text")).as("q_c"))
      .collect()
    assert(rows.length == corpus.size)
    rows.foreach { r =>
      val t = r.getString(0).take(60)
      assert(r.getString(1) == r.getString(2), s"langId divergence on: $t")
      assert(r.getString(3) == r.getString(4), s"trigram divergence on: $t")
      // bit-identical, not approximately equal: the kernel replicates the
      // twin's operation order and Spark's HALF_UP round exactly
      assert(java.lang.Double.doubleToLongBits(r.getDouble(5))
        == java.lang.Double.doubleToLongBits(r.getDouble(6)),
        s"quality divergence on: $t (${r.getDouble(5)} vs ${r.getDouble(6)})")
    }
  }

  test("direct interpreted eval == Column twins (Spark's own lowering)") {
    import spark.implicits._
    val twin = corpus.toDF("text")
      .select(col("text"),
        TextAnalysis.langIdColumn(col("text")).as("lid"),
        TextAnalysis.langIdTrigramColumn(col("text")).as("tri"),
        TextAnalysis.qualityScoreColumn(col("text")).as("q"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getDouble(3)))
      .toMap
    corpus.foreach { s =>
      val low = UTF8String.fromString(s).toLowerCase
      val (lid, tri, q) = twin(s)
      assert(LangEvals.langId(low).toString == lid, s"langId eval divergence on: ${s.take(60)}")
      assert(LangEvals.langIdTrigram(low).toString == tri,
        s"trigram eval divergence on: ${s.take(60)}")
      assert(java.lang.Double.doubleToLongBits(LangEvals.qualityScore(low))
        == java.lang.Double.doubleToLongBits(q),
        s"quality eval divergence on: ${s.take(60)}")
    }
  }

  test("null text: native == twin == CaseWhen fall-through") {
    import spark.implicits._
    val r = Seq[String](null).toDF("text")
      .select(
        TextAnalysis.langId(col("text")),
        TextAnalysis.langIdColumn(col("text")),
        TextAnalysis.langIdTrigram(col("text")),
        TextAnalysis.langIdTrigramColumn(col("text")),
        TextAnalysis.qualityScore(col("text")),
        TextAnalysis.qualityScoreColumn(col("text")))
      .collect().head
    // marker twin: all score comparisons go null -> otherwise("es");
    // trigram twin: trigrams(null) gates to an EMPTY array -> scores 0 -> "en"
    assert(r.getString(0) == "es" && r.getString(1) == "es", s"langId null: $r")
    assert(r.getString(2) == "en" && r.getString(3) == "en", s"trigram null: $r")
    // quality: size(null)=null propagates through BOTH formulations
    assert(r.isNullAt(4) && r.isNullAt(5), s"quality null: $r")
  }

  test("tie order en > de > fr > es and the CJK gate") {
    import spark.implicits._
    val cases = Seq(
      "" -> "en", // all scores 0 -> first branch wins
      "the der" -> "en", // 1-1 tie -> en
      "der le" -> "de", // en 0, de-fr tie -> de
      "le el" -> "fr", // fr-es tie -> fr
      "el los" -> "es", // es alone
      "the 中 der der" -> "zh") // CJK short-circuits everything
    val got = cases.map(_._1).toDF("text")
      .select(col("text"), TextAnalysis.langId(col("text")).as("l"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (s, want) => assert(got(s) == want, s"'$s' -> ${got(s)}, want $want") }
  }
}

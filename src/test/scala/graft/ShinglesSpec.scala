package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Differential pin: the codegen'd word_shingles scanner must equal the
  * pure-Column split/slice/join/distinct chain on edge cases (leading/
  * trailing whitespace, empties, short docs, unicode) and on real testdata.
  */
class ShinglesSpec extends SparkSpec {

  private val edgeCases = Seq(
    "",
    " ",
    "   ",
    "one",
    "one two",
    "one two three",
    "one two three four five",
    " leading space",
    "trailing space ",
    "  both  sides  ",
    "tab\tand\nnewline\rmix",
    "repeat repeat repeat repeat repeat",
    "MiXeD CaSe ToKeNs Here",
    "ünïcödé tökens ÉÀ ß grüß",
    "a b a b a b",
    "xy vertical\ftab")

  test("word_shingles expression == pure-Column twin on edge cases (k=1,2,3,5)") {
    import spark.implicits._
    val df = edgeCases.toDF("text")
    Seq(1, 2, 3, 5).foreach { k =>
      val both = df.select(
        col("text"),
        Dedup.wordShingles(col("text"), k).as("fast"),
        Dedup.wordShinglesColumn(col("text"), k).as("slow"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"k=$k text=${r.getString(0).replace("\n", "\\n")}")
      }
    }
  }

  test("word_shingles expression == pure-Column twin on testdata documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      Dedup.wordShingles(col("text"), 3).as("fast"),
      Dedup.wordShinglesColumn(col("text"), 3).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0L)
  }
}

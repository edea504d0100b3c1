package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.TextAnalysis

/** Interleaved A/B for the round-3 native text-analysis kernels
  * (ScanExprs/LangExprs) vs their regex/Column twins, on the sf0.1
  * documents table amplified to ~1M rows. Bench protocol per
  * BENCH_SCALING.md: both variants alternate inside ONE session so host
  * steal hits them equally; min-of-N reported. Each op reduces through a
  * cheap aggregate so the kernel dominates the measurement.
  */
object TextScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val amp = sys.env.getOrElse("SPARK_GRAFT_AMP", "200").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = Sessions.local(
      Runtime.getRuntime.availableProcessors(), appName = "text-scan-probe")
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = spark.read.parquet(s"$dir/documents.parquet").select("text")
    val docs = (1 to amp).map(_ => docs0).reduce(_ union _).localCheckpoint()
    val n = docs.count()

    def timeIt(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    // sum(hash(..)) not sum(length(..)): length('zh')==length('en')==2 lets
    // PushFoldableIntoBranches + SimplifyConditionals collapse the Column
    // twins' whole CASE to a literal, deleting the very work under test
    // (the first probe cut measured the lang twins at the bare scan floor)
    def strOp(f: Column => Column): DataFrame =
      docs.select(sum(hash(f(col("text")))).as("x"))
    def numOp(f: Column => Column): DataFrame =
      docs.select(sum(f(col("text"))).as("x"))

    val ops: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("lang_marker", () => strOp(TextAnalysis.langId),
        () => strOp(TextAnalysis.langIdColumn)),
      ("lang_trigram", () => strOp(TextAnalysis.langIdTrigram),
        () => strOp(TextAnalysis.langIdTrigramColumn)),
      ("quality", () => numOp(TextAnalysis.qualityScore),
        () => numOp(TextAnalysis.qualityScoreColumn)),
      ("tokens", () => numOp(c => TextAnalysis.wsTokenCount(c) + TextAnalysis.bpeTokenCount(c)),
        () => numOp(c => TextAnalysis.wsTokenCountRegex(c) + TextAnalysis.bpeTokenCountRegex(c))),
      ("fingerprint", () => strOp(TextAnalysis.fingerprint),
        () => strOp(TextAnalysis.fingerprintRegex)),
      ("normalize", () => strOp(TextAnalysis.normalize),
        () => strOp(TextAnalysis.normalizeRegex)))

    // warm-up: one untimed pass of every variant (C2 tier-up)
    ops.foreach { case (_, nat, twin) => timeIt(nat()); timeIt(twin()) }

    val sb = new StringBuilder
    ops.foreach { case (name, nat, twin) =>
      var bestN = Double.MaxValue
      var bestT = Double.MaxValue
      (1 to reps).foreach { _ => // interleaved: native then twin, each rep
        bestN = math.min(bestN, timeIt(nat()))
        bestT = math.min(bestT, timeIt(twin()))
      }
      val mrowsN = n / bestN / 1e6
      if (sb.nonEmpty) sb.append(",")
      sb.append(f""""$name":{"native_sec":$bestN%.3f,"twin_sec":$bestT%.3f,"speedup":${bestT / bestN}%.2f,"native_mrows_per_sec":$mrowsN%.2f}""")
      println(f"[textscan] $name native=$bestN%.3f s twin=$bestT%.3f s speedup=${bestT / bestN}%.2fx")
    }
    println(s"""{"metric":"text_scan_kernels","rows":$n,"reps":$reps,"ops":{${sb.toString}}}""")
    spark.stop()
  }
}

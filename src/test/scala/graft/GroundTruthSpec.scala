package graft

import org.apache.spark.sql.functions._

import graft.ml.GroundTruth
import graft.operators.WideExport
import graft.rules.Rules
import graft.sources.TranscriptGen

class GroundTruthSpec extends SparkSpec {

  test("G1-G4: similarity argmax recovers generator labels on fact turns") {
    import spark.implicits._
    val n = 40
    val turns = (0 until n).flatMap { i =>
      TranscriptGen.labeledTurnsFor(i.toLong, 42L).map { case (t, c) =>
        (t.conv_id, t.turn_idx, Rules.cleanString(t.text), c)
      }
    }
    val turnsDf = turns.map(t => (t._1, t._2, t._3)).toDF("conv_id", "turn_idx", "text_clean")
    val anns = (0 until n).flatMap { i =>
      val f = TranscriptGen.factsFor(i.toLong, 42L, 0, 0)
      TranscriptGen.scriptedTurns(f).filter(_._4 != "description")
        .map { case (_, text, _, cat) => (f.convId, cat, Rules.cleanString(text)) }
    }.toDF("conv_id", "category", "ann_text")

    val labeled = GroundTruth.label(turnsDf, anns, threshold = 0.35)
      .select("conv_id", "turn_idx", "category")
      .as[(String, Int, String)].collect()
      .map { case (c, i, cat) => (c, i) -> cat }.toMap

    val factTurns = turns.filter(_._4 != "description")
    val agree = factTurns.count { case (c, i, _, cat) => labeled.get((c, i)).contains(cat) }
    val rate = agree.toDouble / factTurns.size
    info(f"fact-turn label agreement = $rate%.3f (reference GT f1 anchor: 0.80)")
    assert(rate >= 0.9)
  }

  test("wide export pivots triples back to the reference row shape") {
    import spark.implicits._
    val triples = Seq(
      ("c1", "job_title", "Software Engineer"),
      ("c1", "skill", "Python programming"),
      ("c1", "skill", "Sql databases"),
      ("c1", "employment_type", "full time"),
      ("c2", "job_location", "Germany")).toDF("subj", "pred", "obj")
    val wide = WideExport.widen(triples)
    assert(wide.columns.toSeq == "subj" +: WideExport.preds)
    val c1 = wide.filter(col("subj") === "c1").head()
    assert(c1.getAs[String]("skill") == "Python programming; Sql databases")
    assert(c1.getAs[String]("employment_type") == "full-time") // F14 cleanup
    assert(c1.getAs[String]("job_location") == null)
  }

  test("widen: an obj containing a comma survives intact (per-cell separators, no post-hoc rewrite)") {
    import spark.implicits._
    val triples = Seq(
      ("c1", "hiring_organization", "Acme, Inc"),
      ("c1", "skill", "welding"),
      ("c1", "skill", "arc cutting")).toDF("subj", "pred", "obj")
    val row = WideExport.widen(triples).head()
    assert(row.getAs[String]("hiring_organization") == "Acme, Inc")
    assert(row.getAs[String]("skill") == "arc cutting; welding")
  }

  test("F12 word-to-number work-hours path") {
    val doc = Rules.cleanString("The schedule is forty hours each week.")
    assert(Rules.workHoursGate(doc))
    assert(Rules.extractWorkHourSpans(doc) == Seq("40 hour"))
    assert(Rules.maxWorkHours(Rules.cleanedWorkHours(Seq("40 hour"))) == 40)
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.{Triple, Turn}
import graft.sources.TranscriptGen
import graft.streaming.StreamingIngest

class StreamingSpec extends SparkSpec {

  test("incremental resume: only unprocessed conversations pass the anti-join") {
    import spark.implicits._
    val turns = TranscriptGen.dataset(spark, 10).toDF()
    val existing = Seq(Triple("conv-00000000", "job_title", "x"),
      Triple("conv-00000003", "skill", "y")).toDS().toDF()
    val fresh = StreamingIngest.incrementalNewConvs(turns, existing)
    val convs = fresh.select("conv_id").distinct().as[String].collect().toSet
    assert(!convs.contains("conv-00000000") && !convs.contains("conv-00000003"))
    assert(convs.size == 8)
  }

  test("structured streaming ingest: stateless extraction over a MemoryStream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Turn]
    val extracted = StreamingIngest.extractStream(stream.toDF())
    val query = extracted
      .select(col("conv_id"), col("turn_idx"), col("emp_groups"), col("locations"))
      .writeStream.format("memory").queryName("stream_extract").outputMode("append").start()
    try {
      stream.addData(TranscriptGen.turnsFor(0L, 42L, 0, 0))
      query.processAllAvailable()
      val rows = spark.table("stream_extract").collect()
      assert(rows.nonEmpty)
      val emp = spark.table("stream_extract")
        .select(explode(col("emp_groups"))).as[String].collect()
      // conv 0 plants at least one employment surface when hasEmployment
      val f = TranscriptGen.factsFor(0L, 42L, 0, 0)
      if (f.hasEmployment) assert(emp.nonEmpty)
    } finally query.stop()
  }

  test("stateful running employment resolution emits priority winners") {
    import spark.implicits._
    val turns = TranscriptGen.dataset(spark, 6, 42L, 0, 0).toDF()
    val extracted = StreamingIngest.extractStream(turns)
    val updates = StreamingIngest.runningEmployment(extracted).collect()
    val want = (0 until 6).flatMap { i =>
      val f = TranscriptGen.factsFor(i.toLong, 42L, 0, 0)
      if (f.hasEmployment)
        graft.rules.Rules.priorityEmployment(
          graft.rules.Rules.employmentGroupsOf(f.empSurfaces.flatMap(s =>
            graft.rules.Rules.employmentSurfaces(s)))).map(f.convId -> _)
      else None
    }.toMap
    val got = updates.map(u => u.conv_id -> u.employment).toMap
    want.foreach { case (c, g) => assert(got.get(c).contains(g), s"conv $c") }
  }
}

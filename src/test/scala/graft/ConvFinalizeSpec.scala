package graft

import graft.operators.{ConvFinalize, SalStruct}
import graft.operators.ConvFinalize.SlimTurn

/** Differential pin for the salted two-phase conv aggregation: the
  * production `run` (bounded buckets) must equal the single-phase fold on
  * skew-heavy fixtures, including the order-sensitive salary short-circuit
  * crossing bucket boundaries.
  */
class ConvFinalizeSpec extends SparkSpec {

  private def turn(cid: String, idx: Int, text: String = "plain body text",
      emp: Seq[String] = Nil, loc: Seq[String] = Nil, orgs: Seq[String] = Nil,
      edu: Seq[String] = Nil, sal: Option[SalStruct] = None, tool: String = null): SlimTurn =
    SlimTurn(cid, idx, tool, text, emp, loc, orgs, edu, sal, Nil, Nil)

  test("two-phase salted aggregation == single-phase fold on a 50k-turn skew conversation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // one monster conversation with order-sensitive facts sprinkled in,
    // plus a handful of ordinary ones
    val monster = (0 until 50000).map { i =>
      val sal =
        if (i == 17) Some(SalStruct(Seq(42000.0), Nil, Nil, sw_kw = true))
        else if (i == 33000) Some(SalStruct(Seq(50000.0), Seq("euro"), Seq(50000.0), sw_kw = true))
        else if (i > 33000 && i % 5000 == 0) Some(SalStruct(Seq(1234.0 + i), Nil, Nil, sw_kw = true))
        else None
      turn("conv_monster", i,
        text = s"turn $i body",
        emp = if (i % 9000 == 3) Seq("part-time") else if (i % 4000 == 1) Seq("full-time") else Nil,
        loc = if (i % 700 == 2) Seq(if (i % 3 == 0) "Germany" else "Poland") else Nil,
        orgs = if (i % 11000 == 5) Seq(s"Org ${i % 13}") else Nil,
        edu = if (i % 15000 == 7) Seq("bachelor degree") else Nil,
        sal = sal,
        tool = if (i % 21000 == 9) "search" else null)
    }
    val normal = (0 until 20).flatMap { c =>
      (0 until 5 + rnd.nextInt(10)).map { i =>
        turn(s"conv_$c", i,
          emp = if (i == 2) Seq("internship") else Nil,
          loc = if (i == 1) Seq("France") else Nil,
          sal = if (i == 3) Some(SalStruct(Seq(30000.0 + c), Nil, Nil, sw_kw = true)) else None)
      }
    }
    // shuffle input order: both paths must be insensitive to row order
    val df = rnd.shuffle(monster ++ normal).toDS().toDF()

    val twoPhase = ConvFinalize.run(df, bucketSize = 64).collect()
      .map(c => c.conv_id -> c).toMap
    val single = ConvFinalize.runSinglePhase(df).collect()
      .map(c => c.conv_id -> c).toMap

    assert(twoPhase.keySet == single.keySet)
    twoPhase.keySet.foreach { cid =>
      assert(twoPhase(cid) == single(cid), s"conv $cid")
    }
    // the salary short-circuit must have landed on the currency-associated
    // value, discarding earlier keyword-context accumulations
    assert(twoPhase("conv_monster").sal_values == Seq(50000.0))
  }

  test("salary short-circuit state merges correctly across bucket boundaries") {
    // broke in an EARLY bucket must suppress later buckets' values
    val early = Seq(
      turn("c", 1, sal = Some(SalStruct(Seq(40000.0), Seq("euro"), Seq(40000.0), sw_kw = true))),
      turn("c", 999, sal = Some(SalStruct(Seq(77000.0), Nil, Nil, sw_kw = true))))
    val p0 = ConvFinalize.partialOf("c", 0, Seq(early.head))
    val p1 = ConvFinalize.partialOf("c", 1, Seq(early(1)))
    val merged = ConvFinalize.mergePartials("c", Seq(p1, p0)) // unsorted on purpose
    val direct = ConvFinalize.finalizeConv("c", early)
    assert(merged == direct)
    assert(merged.sal_values == Seq(40000.0))
  }

  // ---------------- clustered-input fast path ----------------

  /** all messages down the cause chain (Spark wraps executor throws). */
  private def msgChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
      .map(x => s"${x.getClass.getName}: ${Option(x.getMessage).getOrElse("")}")
      .mkString(" | ")

  /** clustered layout: convs contiguous, turns sorted — what a transcript
    * table SORTED BY (conv_id, turn_idx) delivers per partition.
    */
  private def clusteredFixture: Seq[SlimTurn] = {
    val monster = (0 until 150).map { i =>
      turn("conv_x_monster", i,
        text = s"monster $i",
        emp = if (i % 41 == 3) Seq("full-time") else Nil,
        loc = if (i % 13 == 2) Seq(if (i % 2 == 0) "Germany" else "Poland") else Nil,
        sal =
          if (i == 9) Some(SalStruct(Seq(41000.0), Nil, Nil, sw_kw = true))
          else if (i == 97) Some(SalStruct(Seq(52000.0), Seq("euro"), Seq(52000.0), sw_kw = true))
          else None,
        tool = if (i % 77 == 5) "search" else null)
    }
    val normal = (0 until 12).flatMap { c =>
      (0 until 9).map { i =>
        turn(f"conv_$c%02d", i,
          emp = if (i == 2) Seq("internship") else Nil,
          loc = if (i == 1) Seq("France") else Nil,
          edu = if (i == 4 && c % 3 == 0) Seq("bachelor degree") else Nil,
          sal = if (i == 3) Some(SalStruct(Seq(30000.0 + c), Nil, Nil, sw_kw = true)) else None)
      }
    }
    normal.take(54) ++ monster ++ normal.drop(54) // monster mid-stream
  }

  test("clustered fast path == single-phase fold, convs straddling partition boundaries") {
    import spark.implicits._
    val rows = clusteredFixture
    // 7 positional slices over 258 rows cut mid-conversation several times,
    // and the 150-turn monster spans multiple slices end to end
    val df = spark.createDataset(spark.sparkContext.parallelize(rows, 7)).toDF()
    // bucketSize 16 forces multi-chunk runs inside each partition
    val clustered = ConvFinalize.runClustered(df, bucketSize = 16).collect()
      .map(c => c.conv_id -> c).toMap
    val single = ConvFinalize.runSinglePhase(df).collect()
      .map(c => c.conv_id -> c).toMap
    assert(clustered.keySet == single.keySet)
    clustered.keySet.foreach(cid => assert(clustered(cid) == single(cid), s"conv $cid"))
    // the monster's currency short-circuit crossed chunk AND partition edges
    assert(clustered("conv_x_monster").sal_values == Seq(52000.0))
  }

  test("clustered fast path: single-partition input (every run is boundary) still exact") {
    import spark.implicits._
    val df = spark.createDataset(spark.sparkContext.parallelize(clusteredFixture, 1)).toDF()
    val clustered = ConvFinalize.runClustered(df, bucketSize = 16).collect()
      .map(c => c.conv_id -> c).toMap
    val single = ConvFinalize.runSinglePhase(df).collect()
      .map(c => c.conv_id -> c).toMap
    assert(clustered == single)
  }

  test("clustered fast path throws on interleaved conv runs instead of corrupting") {
    import spark.implicits._
    val rows = Seq(turn("a", 0), turn("b", 0), turn("b", 1), turn("a", 1), turn("c", 0))
    val df = spark.createDataset(spark.sparkContext.parallelize(rows, 1)).toDF()
    val e = intercept[Exception](ConvFinalize.runClustered(df).collect())
    assert(msgChain(e).contains("not clustered"), msgChain(e))
  }

  test("clustered fast path throws on unsorted turn_idx instead of corrupting") {
    import spark.implicits._
    val rows = Seq(turn("z", 0), turn("a", 5), turn("a", 3), turn("a", 7), turn("q", 0))
    val df = spark.createDataset(spark.sparkContext.parallelize(rows, 1)).toDF()
    val e = intercept[Exception](ConvFinalize.runClustered(df).collect())
    assert(msgChain(e).contains("not sorted"), msgChain(e))
  }

  test("clustered fast path throws when a conversation is duplicated across partitions") {
    import spark.implicits._
    val one = spark.createDataset(spark.sparkContext.parallelize(clusteredFixture, 2))
    val df = one.union(one).toDF() // same convs appear in both copies' partitions
    val e = intercept[Exception](ConvFinalize.runClustered(df, bucketSize = 16).collect())
    assert(msgChain(e).contains("ConvContractViolation"), msgChain(e))
  }

  test("SINGLE-turn conversation duplicated across partitions throws, not merges") {
    import spark.implicits._
    // both copies are boundary partials with the zero-width range [0,0] —
    // the inclusive-range overlap guard must catch the shared endpoint
    // (a strict '<' would silently merge the turn twice: text "t. t")
    val rows = Seq(turn("solo", 0, text = "only turn"))
    val df = spark.createDataset(spark.sparkContext.parallelize(rows, 1))
      .union(spark.createDataset(spark.sparkContext.parallelize(rows, 1))).toDF()
    val e = intercept[Exception](ConvFinalize.runClustered(df).collect())
    assert(msgChain(e).contains("ConvContractViolation"), msgChain(e))
  }

  test("duplicated boundary turn (shared range endpoint) throws, not double-merges") {
    import spark.implicits._
    // partition 1 ends conv "a" at turn 5; partition 2 repeats turn 5 —
    // partials [0,5] and [5,9] share an endpoint and must be rejected
    val p1 = (0 to 5).map(i => turn("a", i, text = s"t$i"))
    val p2 = (5 to 9).map(i => turn("a", i, text = s"t$i"))
    val df = spark.createDataset(spark.sparkContext.parallelize(p1, 1))
      .union(spark.createDataset(spark.sparkContext.parallelize(p2, 1))).toDF()
    val e = intercept[Exception](ConvFinalize.runClustered(df).collect())
    assert(msgChain(e).contains("ConvContractViolation"), msgChain(e))
  }

  test("duplicate turn_idx inside a run throws (uniqueness is part of the contract)") {
    import spark.implicits._
    val rows = Seq(turn("a", 0), turn("a", 1), turn("a", 1), turn("a", 2))
    val df = spark.createDataset(spark.sparkContext.parallelize(rows, 1)).toDF()
    val e = intercept[Exception](ConvFinalize.runClustered(df).collect())
    assert(msgChain(e).contains("ConvContractViolation") &&
      msgChain(e).contains("not sorted"), msgChain(e))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic content-hash sampling: the properties df.sample() cannot
  * give — layout independence, accretion stability, exact split
  * partitioning — plus rate accuracy and skew-bounded top-k.
  */
class SamplingSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()

  test("cutoffHex: floor(rate * 2^32) in fixed-width hex, clamped at 1.0") {
    assert(Sampling.cutoffHex(0.0) == "00000000")
    assert(Sampling.cutoffHex(0.25) == "40000000")
    assert(Sampling.cutoffHex(0.75) == "c0000000")
    assert(Sampling.cutoffHex(0.875) == "e0000000")
    assert(Sampling.cutoffHex(1.0) == "ffffffff")
    intercept[IllegalArgumentException](Sampling.cutoffHex(1.5))
  }

  test("hashSample: membership is layout-independent and accretion-stable") {
    import spark.implicits._
    val base = Sampling.hashSample(docs, col("doc_id"), 0.3, "t1")
      .select("doc_id").as[Long].collect().toSet
    // same draw after an adversarial repartition (df.sample would differ)
    val repart = Sampling.hashSample(docs.repartition(17, col("lang")),
      col("doc_id"), 0.3, "t1").select("doc_id").as[Long].collect().toSet
    assert(repart == base)
    // accretion: sampling a superset keeps yesterday's members unchanged
    val grown = docs.union(docs.select((col("doc_id") + 1000000L).as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars")))
    val after = Sampling.hashSample(grown, col("doc_id"), 0.3, "t1")
      .select("doc_id").as[Long].collect().toSet
    assert(after.filter(_ < 1000000L) == base)
    // rate lands within binomial noise (n=500, sd ~= 10)
    assert(math.abs(base.size / 500.0 - 0.3) < 0.08, s"rate off: ${base.size}/500")
    // rate 1.0 short-circuits to keep-all
    assert(Sampling.hashSample(docs, col("doc_id"), 1.0, "t1").count() == docs.count())
  }

  test("splitColumn: buckets partition the keyspace at the asked weights") {
    import spark.implicits._
    val split = docs.select(col("doc_id"), Sampling.splitColumn(col("doc_id"),
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125), "t2").as("split"))
    val byBucket = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byBucket.keySet == Set("train", "val", "test"))
    assert(byBucket.values.sum == docs.count()) // exactly one bucket per key
    assert(math.abs(byBucket("train") / 500.0 - 0.75) < 0.08)
    // deterministic: re-evaluation gives the identical assignment
    val again = docs.select(col("doc_id"), Sampling.splitColumn(col("doc_id"),
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125), "t2").as("split"))
    assert(split.except(again).count() == 0 && again.except(split).count() == 0)
    intercept[IllegalArgumentException](
      Sampling.splitColumn(col("doc_id"), Seq("a" -> 0.7, "b" -> 0.2)))
  }

  test("stratifiedSample: per-stratum rates honored, unlisted strata default") {
    import spark.implicits._
    val s = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 1.0, "de" -> 0.0), defaultRate = 0.5, salt = "t3")
    val kept = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    val all = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    // rate 1.0 via cutoff ffffffff keeps all but a 2^-32 sliver — exact here
    assert(kept("en") == all("en"))
    assert(!kept.contains("de"))
    val restKept = kept.filterKeys(k => k != "en" && k != "de").values.sum.toDouble
    val restAll = all.filterKeys(k => k != "en" && k != "de").values.sum.toDouble
    assert(math.abs(restKept / restAll - 0.5) < 0.12, s"default rate off: $restKept/$restAll")
  }

  test("groupTopK: bounded at k per group, deterministic, hash-ranked") {
    import spark.implicits._
    val top = Sampling.groupTopK(docs, col("lang"), col("doc_id"), 3, "t4")
    val perGroup = top.groupBy("lang").count().as[(String, Long)].collect()
    assert(perGroup.nonEmpty && perGroup.forall(_._2 <= 3))
    assert(top.filter(col("rn") < 1 || col("rn") > 3).count() == 0)
    // rank is dense from 1 within each group
    val ranks = top.groupBy("lang").agg(sort_array(collect_list("rn")).as("r"))
      .select("r").as[Seq[Int]].collect()
    ranks.foreach(r => assert(r == (1 to r.size), s"non-dense ranks: $r"))
    // layout-independent
    val a = top.select("doc_id", "lang", "rn").collect().toSet
    val b = Sampling.groupTopK(docs.repartition(13), col("lang"), col("doc_id"), 3, "t4")
      .select("doc_id", "lang", "rn").collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException](
      Sampling.groupTopK(docs, col("lang"), col("doc_id"), 0))
  }

  test("epochMix: guaranteed floor copies, fractional extras, exact repeats") {
    import spark.implicits._
    val mixed = Sampling.epochMix(docs, col("doc_id"), col("lang"),
      Map("de" -> 3.0, "en" -> 0.25, "fr" -> 1.5), defaultRate = 1.0, salt = "t6")
    val all = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val out = mixed.groupBy("lang").count().as[(String, Long)].collect().toMap
    // integral rate: EXACT repetition, copy indices dense 0..2
    assert(out("de") == 3 * all("de"))
    assert(mixed.filter(col("lang") === "de").groupBy("doc_id").count()
      .filter(col("count") =!= 3).count() == 0)
    assert(mixed.filter(col("lang") === "de")
      .select("copy").distinct().as[Int].collect().sorted.toSeq == Seq(0, 1, 2))
    // fractional-only rate: a downsample, never more than one copy
    assert(out("en") <= all("en"))
    assert(math.abs(out("en").toDouble / all("en") - 0.25) < 0.2)
    assert(mixed.filter(col("lang") === "en" && col("copy") > 0).count() == 0)
    // 1.5: every row at least once, ~half twice
    val fr = mixed.filter(col("lang") === "fr").groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(fr.size == all("fr"), "rate >= 1 must keep every row")
    assert(fr.values.forall(c => c == 1 || c == 2))
    // unlisted strata: rate 1.0 = identity with copy 0
    val rest = mixed.filter(!col("lang").isin("de", "en", "fr"))
    assert(rest.count() == all.filterKeys(k => !Set("de", "en", "fr")(k)).values.sum)
    assert(rest.filter(col("copy") =!= 0).count() == 0)
  }

  test("epochMix: deterministic under repartitioning; rate 0 drops a stratum") {
    val a = Sampling.epochMix(docs, col("doc_id"), col("lang"),
      Map("en" -> 1.75, "de" -> 0.0), salt = "t7")
      .select("doc_id", "copy").collect().toSet
    val b = Sampling.epochMix(docs.repartition(19, col("source")), col("doc_id"),
      col("lang"), Map("en" -> 1.75, "de" -> 0.0), salt = "t7")
      .select("doc_id", "copy").collect().toSet
    assert(a == b)
    assert(Sampling.epochMix(docs, col("doc_id"), col("lang"),
      Map("de" -> 0.0), salt = "t7").filter(col("lang") === "de").count() == 0)
    intercept[IllegalArgumentException](Sampling.epochMix(docs, col("doc_id"),
      col("lang"), Map("en" -> -0.1)))
  }

  test("null keys draw deterministically instead of vanishing") {
    import spark.implicits._
    val withNull = Seq((Some(1L), "a"), (None, "b"), (None, "c"))
      .toDF("doc_id", "payload")
    // the null-key draw is md5(':salt') — all null keys share one fate
    val kept = Sampling.hashSample(withNull, col("doc_id"), 0.9999, "t5")
    val keptN = kept.filter(col("doc_id").isNull).count()
    assert(keptN == 0 || keptN == 2)
    val split = withNull.select(Sampling.splitColumn(col("doc_id"),
      Seq("x" -> 0.5, "y" -> 0.5), "t5").as("s")).as[String].collect()
    assert(split.forall(s => s == "x" || s == "y")) // nulls still assigned
  }
}

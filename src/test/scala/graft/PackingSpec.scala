package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Concat-and-chunk sequence packing: spans tile each document exactly,
  * every sequence but the last is full, layout is a pure function of the
  * corpus content (identical across parallelism levels and input
  * partitionings), and boundary docs split correctly.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int): DataFrame =
    (0 until n).map(i => (i.toLong, 1 + (i * 37) % 700)).toDF("id", "tok")

  test("spans tile each document and conserve total tokens") {
    val packed = Packing.packSequences(docs(200), col("id"), col("tok"), seqLen = 256)
    val perDoc = packed.groupBy("id")
      .agg(sum("span_len").as("s"), first("n_tokens").as("t"),
        min("span_begin").as("b0"),
        max(col("span_begin") + col("span_len")).as("b1"))
      .collect()
    assert(perDoc.length == 200)
    perDoc.foreach { r =>
      assert(r.getAs[Long]("s") == r.getAs[Long]("t"), s"doc ${r.get(0)} spans don't sum")
      assert(r.getAs[Long]("b0") == 0L && r.getAs[Long]("b1") == r.getAs[Long]("t"),
        s"doc ${r.get(0)} spans don't tile [0, t)")
    }
  }

  test("every sequence except the last is exactly full") {
    val packed = Packing.packSequences(docs(200), col("id"), col("tok"), seqLen = 256)
    val seqs = packed.groupBy("seq_id").agg(sum("span_len").as("fill"))
      .orderBy("seq_id").collect()
    val lastSeq = seqs.last.getAs[Long]("seq_id")
    seqs.init.foreach(r => assert(r.getAs[Long]("fill") == 256L,
      s"seq ${r.get(0)} not full: ${r.get(1)}"))
    assert(seqs.last.getAs[Long]("fill") <= 256L)
    // sequence ids are dense 0..last
    assert(seqs.map(_.getAs[Long]("seq_id")).toSeq == (0L to lastSeq))
  }

  test("packing is identical across input partitionings and parallelism") {
    val a = Packing.packSequences(docs(300), col("id"), col("tok"),
        seqLen = 128, partitions = 3)
      .select("id", "start_offset", "seq_id", "span_begin", "span_len")
      .orderBy("id", "seq_id").collect().toSeq
    val b = Packing.packSequences(docs(300).repartition(17), col("id"), col("tok"),
        seqLen = 128, partitions = 11)
      .select("id", "start_offset", "seq_id", "span_begin", "span_len")
      .orderBy("id", "seq_id").collect().toSeq
    assert(a == b, "pack layout must not depend on partitioning")
  }

  test("boundary docs: exact fit, multi-sequence straddle, zero/null drop") {
    val d = Seq(
      (1L, 100),   // plus (2L): together exactly one 128-seq? exercise offsets
      (2L, 28),
      (3L, 300),   // straddles >2 sequences of 128
      (4L, 0),     // dropped
      (5L, -3)     // dropped
    ).toDF("id", "tok")
      .unionByName(Seq((6L, Option.empty[Int])).toDF("id", "tok"))
    val packed = Packing.packSequences(d, col("id"), col("tok"), seqLen = 128)
    assert(packed.where(col("id").isin(4L, 5L, 6L)).count() == 0)
    val doc3 = packed.where(col("id") === 3L).orderBy("seq_id").collect()
    assert(doc3.length >= 3, s"300 tokens over 128-seqs must straddle >= 3: ${doc3.length}")
    // consecutive spans of one doc are contiguous in both doc and stream space
    doc3.sliding(2).foreach { case Array(x, y) =>
      assert(x.getAs[Long]("span_begin") + x.getAs[Long]("span_len") ==
        y.getAs[Long]("span_begin"))
      assert(y.getAs[Long]("seq_id") == x.getAs[Long]("seq_id") + 1)
    }
    // interior spans of a straddling doc are full sequences
    doc3.init.tail.foreach(r => assert(r.getAs[Long]("span_len") == 128L))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for LLM pretraining batches: lay the corpus out in a
  * deterministic order, assign each document a global token offset by
  * prefix sum, and split it into the fixed-length training sequences it
  * overlaps (the standard concat-and-chunk shape — documents are
  * concatenated back to back and the stream is cut every `seqLen`
  * tokens, so no sequence carries padding and every token is trained
  * on exactly once).
  *
  * Determinism is the load-bearing property, same as [[Sampling]]: the
  * layout order is the content-hash draw (md5 of the key), so the
  * packing — which documents share a sequence, where each lands — is a
  * pure function of the corpus content. A retry, a repartition, AQE, or
  * a different cluster size reproduces byte-identical pack assignments,
  * and the DuckDB oracle recomputes the IDENTICAL layout from scratch
  * (q69) — a nondeterministic pack would make training runs
  * unreproducible and eval-contamination audits impossible.
  *
  * Scale shape: one range shuffle on the hash order, then two NARROW
  * passes over the shuffled partitions — pass one sends a single Long
  * per partition to the driver (the partition's token total, the same
  * per-partition-offsets-only-to-the-driver shape as HtmlChunk's global
  * id assignment, E1), pass two adds the broadcast cumulative offset to
  * a running local sum. No global single-partition window (the naive
  * `sum OVER (ORDER BY ...)` plan), no driver-side data.
  */
object Packing {

  /** One row per (document, training sequence) span.
    *
    * Input: any DataFrame with a unique `key` column and a positive
    * `tokens` count column. Rows with null/zero/negative token counts
    * occupy no span and are dropped.
    *
    * Output: the input columns plus
    *   - `n_tokens`      the document's token count (the `tokens` arg);
    *   - `start_offset`  the document's first token's global offset;
    *   - `seq_id`        a training sequence (0-based) the doc overlaps;
    *   - `span_begin`    where in the DOCUMENT this sequence's slice starts;
    *   - `span_len`      how many tokens of the doc land in this sequence.
    *
    * Invariants (spec-pinned): per doc, the spans tile [0, n_tokens)
    * exactly; per sequence except the last, spans sum to `seqLen`.
    */
  def packSequences(df: DataFrame, key: Column, tokens: Column, seqLen: Int,
      salt: String = "graft", partitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val spark = df.sparkSession
    val nPart =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val base = df
      .withColumn("n_tokens", tokens.cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("_h", Sampling.unitHex(key, salt))
    val ordCols = Seq(col("_h"), key)
    // ONE shuffle: range-partition + sort by the deterministic layout
    // order. The two RDD passes below both read these shuffle files
    // (Spark skips the exchange stage on the second job).
    val ranged = base.repartitionByRange(nPart, ordCols: _*)
      .sortWithinPartitions(ordCols: _*)
    val schema = ranged.schema
    val tokIdx = schema.fieldIndex("n_tokens")
    // pass 1: per-partition token totals — N Longs to the driver, never rows
    val totals = ranged.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L; it.foreach(s += _.getLong(tokIdx)); Iterator((pid, s))
      }.collect().toMap
    val offsets = (0 until nPart).scanLeft(0L)((acc, p) => acc + totals.getOrElse(p, 0L))
    val bc = spark.sparkContext.broadcast(offsets.toArray)
    // pass 2: local running sum + broadcast partition offset = global offset
    val withStart = spark.createDataFrame(
      ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = bc.value(pid)
        it.map { r =>
          val out = Row.fromSeq(r.toSeq :+ acc)
          acc += r.getLong(tokIdx)
          out
        }
      }, schema.add("start_offset", LongType, nullable = false))
    // a doc starting at s with t tokens overlaps sequences
    // [s div L, (s + t - 1) div L]; integral div (never a double round
    // trip — offsets near 2^53 would lose exactness at real corpus sizes)
    val L = lit(seqLen.toLong)
    withStart
      .withColumn("_end", col("start_offset") + col("n_tokens"))
      .withColumn("seq_id", explode(sequence(
        expr(s"start_offset div ${seqLen}L"), expr(s"(_end - 1) div ${seqLen}L"))))
      .withColumn("span_begin",
        greatest(lit(0L), col("seq_id") * L - col("start_offset")))
      .withColumn("span_len",
        least(col("_end"), (col("seq_id") + 1) * L) -
          greatest(col("start_offset"), col("seq_id") * L))
      .drop("_h", "_end")
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.VersionedTable

/** Exactly-once streaming sink into a [[graft.sources.VersionedTable]] —
  * the piece that turns the streaming KG path (StreamingTriples) into a
  * durable incremental table instead of a memory sink.
  *
  * Structured Streaming's foreachBatch is at-least-once: after a crash
  * between the sink write and the checkpoint commit, the restarted query
  * RE-DELIVERS the last batch with the SAME batchId. Exactness therefore
  * lives in the sink: each micro-batch commits through
  * [[VersionedTable.appendOnce]] keyed by `<queryName>#<batchId>`, so the
  * replay finds its txn already in the manifest and lands as a no-op
  * (Iceberg/Delta's idempotent-writes pattern: the commit log is the
  * dedup ledger). Combined with the checkpointed source offsets this
  * gives end-to-end exactly-once for any replayable source.
  *
  * Scale shape: each micro-batch is one appended file group + one
  * manifest line — no read of existing data, O(1) in table size — and the
  * accreted small groups fold back via [[VersionedTable.compact]], whose
  * content-identity gate the streaming accretion pattern is exactly the
  * motivation for.
  */
object VersionedSink {

  /** The txn namespace for a checkpointed query: the query id Spark
    * persists at `<checkpoint>/metadata` on first start. That id has
    * EXACTLY the lifetime batchIds have — unique per logical query,
    * stable across restarts from the checkpoint, and regenerated when the
    * checkpoint is wiped — so keying txns on it can neither collide
    * across queries nor replay-swallow the restarted batch 0 after a
    * checkpoint reset (a name- or path-based key survives the reset and
    * does both). Resolved through the checkpoint's Hadoop filesystem
    * (the checkpoint may be a qualified URI on a real cluster); read
    * per batch, uncached — a tiny driver-side read, and a cache could
    * serve a stale id to a post-reset run in the same JVM. An unreadable
    * metadata file THROWS (failing the batch, which Spark retries): every
    * caller runs after query start, when the file exists, so a read
    * failure is a transient IO error — and falling back to any stable
    * string would key this batch in a namespace no other run uses,
    * silently breaking exactly-once in both directions (a replay of this
    * batch wouldn't be recognized; a fallback-keyed ledger entry would
    * swallow a future reset's batch of the same id).
    */
  def checkpointTxnNamespace(spark: SparkSession, checkpoint: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, "metadata")
    val json =
      try {
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val in = fs.open(p)
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"cannot read the query id from $p — refusing to guess a txn " +
            "namespace (exactly-once would silently break); the batch will " +
            "be retried", e)
      }
    """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(json).map(_.group(1))
      .getOrElse(throw new IllegalStateException(
        s"no query id in $p — malformed checkpoint metadata"))
  }

  /** Start an exactly-once append stream into `table`. Txn keys are
    * scoped by [[checkpointTxnNamespace]] — see there for why neither the
    * query name nor the checkpoint path is a safe namespace.
    */
  def exactlyOnce[T](ds: Dataset[T], table: String, checkpoint: String,
      queryName: String)(implicit spark: SparkSession): StreamingQuery =
    ds.writeStream
      .queryName(queryName)
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[T], batchId: Long) =>
        // stateful upstreams run NO-DATA micro-batches to fire event-time
        // timeouts; skip the empty ones or the table accretes one empty
        // file group + manifest line per idle tick. Exactness holds: an
        // unrecorded empty batch replays as another empty no-op.
        if (!batch.isEmpty) {
          val ns = checkpointTxnNamespace(batch.sparkSession, checkpoint)
          VersionedTable.appendOnce(batch.toDF(), table, s"$ns#$batchId")
          ()
        }
      }
      .start()

  /** The batch-commit body alone, for tests that simulate the
    * crash-replay delivery directly. `txnAppId` must be an identifier
    * with the checkpoint's lifetime — unique per logical query, reset
    * when batchIds reset ([[checkpointTxnNamespace]] of the query's
    * checkpoint is the canonical choice).
    */
  def commitBatch(batch: DataFrame, table: String, txnAppId: String,
      batchId: Long)(implicit spark: SparkSession): Boolean =
    VersionedTable.appendOnce(batch, table, s"$txnAppId#$batchId")._2
}

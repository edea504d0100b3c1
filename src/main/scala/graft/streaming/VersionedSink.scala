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

  /** Start an exactly-once append stream into `table`. `queryName` scopes
    * the txn keys, so distinct queries (or a re-named restart, which gets
    * a fresh checkpoint anyway) never collide in the ledger.
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
          VersionedTable.appendOnce(batch.toDF(), table, s"$queryName#$batchId")
          ()
        }
      }
      .start()

  /** The batch-commit body alone, for tests that simulate the
    * crash-replay delivery directly.
    */
  def commitBatch(batch: DataFrame, table: String, queryName: String,
      batchId: Long)(implicit spark: SparkSession): Boolean =
    VersionedTable.appendOnce(batch, table, s"$queryName#$batchId")._2
}

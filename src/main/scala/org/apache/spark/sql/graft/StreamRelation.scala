package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** The one `private[sql]` doorway the versioned streaming source needs
  * (the same shim shape Delta uses): a V1 `Source.getBatch` must hand the
  * engine a DataFrame whose plan is flagged `isStreaming = true` —
  * MicroBatchExecution asserts it — and the only constructors for that
  * flag (`LogicalRelation(_, isStreaming)`, `Dataset.ofRows`) are
  * source-level `private[sql]`. Everything else about the source lives in
  * `graft.streaming`; this file exists solely to sit inside the `sql`
  * package and forward the call.
  */
object StreamRelation {
  def streamingScan(spark: SparkSession, rel: HadoopFsRelation): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession],
      LogicalRelation(rel, isStreaming = true))

  /** The inverse doorway for the V1 streaming SINK: the DataFrame handed
    * to `Sink.addBatch` is backed by the engine's IncrementalExecution
    * and cannot be re-planned by a normal batch write. This is the same
    * re-wrap ForeachBatchSink performs — reuse the already-planned
    * physical rows as a fresh batch-mode plan.
    */
  def asBatch(data: DataFrame): DataFrame = {
    val ds = data.asInstanceOf[Dataset[_]]
    Dataset.ofRows(ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        ds.queryExecution.toRdd, ds, isStreaming = false))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.sources.Versioned

/** Exactly-once streaming sink into a [[graft.sources.Versioned]]
  * table: every micro-batch becomes one committed snapshot version.
  *
  * foreachBatch is at-least-once — after a crash between the batch's
  * side effect and the checkpoint write, the engine REPLAYS the same
  * (batch, batchId). A plain append sink would double-write that
  * batch. Here each commit carries the idempotence token
  * `<appId>:<batchId>` in its manifest ([[Versioned.commitTxn]]): the
  * replay finds the token and returns the already-committed version
  * instead of appending again — the manifest ledger IS the sink's
  * transaction log, so exactly-once needs no second storage system.
  *
  * Scale shape: the data write is the normal distributed parquet
  * write; the txn check is a driver-side manifest scan (head-first —
  * a retried batch is at the head; size = commit count, trimmed by
  * vacuum). Readers see each micro-batch atomically via the usual
  * manifest-resolve-first snapshot read, and time travel across
  * batch boundaries comes free.
  */
object VersionedSink {

  /** Commit one micro-batch (the foreachBatch body, exposed directly
    * so batch jobs and specs can drive the identical code path). */
  def commitBatch(batch: DataFrame, path: String, appId: String,
      batchId: Long): Int =
    Versioned.commitTxn(batch, path, overwrite = false,
      txn = Some(s"$appId:$batchId"))

  /** Wire a streaming Dataset to a versioned-table sink. `appId`
    * scopes batch ids across restarts — pass a stable identifier per
    * logical pipeline (the query checkpoint's identity), not a random
    * run id, or replayed batches stop deduplicating. */
  def versionedAppend[T](ds: Dataset[T], path: String, appId: String,
      checkpointDir: String): DataStreamWriter[Row] =
    ds.toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, path, appId, batchId): Unit
      }
}

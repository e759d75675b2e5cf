package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.SnapshotLog

/** Stream → snapshot-table sink: every micro-batch commits as one
  * [[SnapshotLog]] version via [[SnapshotLog.appendTxn]], keyed by
  * (appId, batchId).
  *
  * Delivery contract: EXACTLY-ONCE at the read level — the upgrade
  * over [[LakeSink]]'s at-least-once file appends. Structured
  * Streaming replays a micro-batch with the SAME batchId after any
  * crash (that is the checkpoint contract), and the log's txn map
  * makes the replay a no-op: the id check runs before staging and
  * again inside the commit loop's race retry, so a batch lands in
  * exactly one committed listing even under a zombie-driver twin. A
  * crash between staging and commit leaves only orphan files no
  * snapshot references — invisible to readers, aged out by
  * [[SnapshotLog.vacuum]]'s grace window. No ledger marker, no
  * downstream keep-latest dedup required.
  *
  * The checkpoint must be DURABLE for the same reason as LakeSink's:
  * batchIds restart from 0 under a fresh checkpoint, and the txn map
  * would then discard genuinely new batches as replays.
  *
  * Scale shape: one KB-scale commit document per micro-batch on the
  * driver; the data write is the batch's own executor-side parquet
  * job. Maintenance ([[SnapshotLog.compact]]) runs between batches
  * and aborts cleanly if it races a batch commit into the same
  * partitions.
  */
object SnapshotSink {

  /** `appId` is REQUIRED and must be unique per logical stream writing
    * this table (and stable across that stream's restarts): two
    * streams sharing one id would judge each other's batchIds as
    * replays and silently drop data.
    */
  def start(events: DataFrame, tableDir: String, appId: String,
      partCols: Seq[String] = Nil,
      checkpoint: Option[String] = None): StreamingQuery =
    events.writeStream.outputMode("append")
      .option("checkpointLocation",
        checkpoint.getOrElse(s"$tableDir/_checkpoints/$appId"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SnapshotLog.appendTxn(batch, tableDir, partCols, appId, batchId)
        ()
      }
      .start()
}

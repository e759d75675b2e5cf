package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ingest.Manifest

/** The stream → lake sink leg (SURVEY §2.1 H4): `foreachBatch` with a
  * batch-id ledger and bounded exponential-backoff retries. The
  * reference wraps every API call in retry-with-backoff
  * (`make_api_request`, api_helpers.py:455-491); on a lake engine the
  * flaky boundary is the SINK (object-store 429/503s), so the backoff
  * loop lives around the micro-batch write.
  *
  * Delivery contract: AT-LEAST-ONCE at the file level. The
  * `_ledger/<entity>/batch-<id>` marker (written AFTER the data) stops
  * a restarted query from re-committing an already-marked batch, but
  * two failure shapes still duplicate files: a crash between write and
  * marker replays the whole batch, and a mid-JOB failure inside one
  * attempt can leave that attempt's already-committed task files
  * behind before the retry re-appends (object stores have no job-level
  * rollback). Keyed consumers recover exactly-once via the downstream
  * keep-latest dedup (Q19 / ingest upsert) — the same contract as the
  * reference's re-fetch-and-overwrite daily mode; non-keyed consumers
  * see duplicates unless they read through a snapshot-committed table
  * ([[graft.operators.SnapshotLog]]), whose commit lists exactly one
  * successful attempt's files and never exposes orphans —
  * [[SnapshotSink]] is that upgrade packaged as a sink: txn-keyed
  * snapshot commits give exactly-once at the read level.
  *
  * Scale: the ledger is one O(bytes) marker per micro-batch (the shape
  * of a commit-log entry); the write itself is an append of the
  * batch's files, partitioned by ingest date — no table rewrite, no
  * driver-side data.
  */
object LakeSink {

  private def ledgerMarker(df: DataFrame, lake: String, entity: String,
      batchId: Long): (org.apache.hadoop.fs.FileSystem, Path) = {
    val dir = new Path(lake, s"_ledger/$entity")
    val fs = dir.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    (fs, new Path(dir, s"batch-$batchId"))
  }

  /** Commit one micro-batch: skip (return false) if its id is already
    * in the ledger; otherwise append date-partitioned parquet with up
    * to `maxRetries` exponential-backoff retries, record a manifest
    * entry, and drop the ledger marker (return true).
    */
  def commitBatch(batch: DataFrame, lake: String, entity: String,
      batchId: Long, maxRetries: Int = 3, backoffMs: Long = 50): Boolean = {
    val (fs, marker) = ledgerMarker(batch, lake, entity, batchId)
    if (fs.exists(marker)) return false // replayed batch — already in
    val dated = batch.withColumn("ingest_date", to_date(col("ts")))
    dated.persist()
    try {
      val rows = dated.count()
      var attempt = 0
      var done = false
      while (!done) {
        try {
          dated.write.mode("append").partitionBy("ingest_date").parquet(lake)
          done = true
        } catch {
          // NonFatal only: an interrupt/OOM must surface, not re-write
          // the batch; every failed attempt is logged so sink
          // flakiness stays diagnosable
          case scala.util.control.NonFatal(e) if attempt < maxRetries =>
            attempt += 1
            System.err.println(
              s"[lakesink] $entity batch $batchId attempt $attempt failed: ${e.getMessage}")
            Thread.sleep(backoffMs << (attempt - 1))
        }
      }
      Manifest.record(dated, lake, entity, rows)
      fs.mkdirs(marker.getParent)
      fs.createNewFile(marker)
      true
    } finally dated.unpersist(blocking = false)
  }

  /** Start the streaming sink: every micro-batch of `events` commits
    * through [[commitBatch]].
    *
    * The checkpoint defaults to `<lake>/_checkpoints/<entity>` — it
    * must be DURABLE, because the ledger's replay detection keys on
    * the checkpoint's batch ids: with a temp checkpoint a restarted
    * query would recount from 0 and the ledger would discard fresh
    * batches as replays (silent data loss).
    */
  def start(events: DataFrame, lake: String, entity: String = "events",
      checkpoint: Option[String] = None): StreamingQuery =
    events.writeStream.outputMode("append")
      .option("checkpointLocation",
        checkpoint.getOrElse(s"$lake/_checkpoints/$entity"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, lake, entity, batchId)
        ()
      }
      .start()
}

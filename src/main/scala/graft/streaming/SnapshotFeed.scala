package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.SnapshotLog

/** Incremental consumer of a snapshot table's change feed — the
  * read-side twin of [[SnapshotSink]] (which produces commits
  * exactly-once). Each named consumer keeps a durable CURSOR (last
  * fully-processed version) under `<table>/_graft_feed/<consumer>`;
  * a poll hands back exactly the rows committed after the cursor via
  * [[SnapshotLog.changesBetween]], and the cursor only advances AFTER
  * the caller's processing succeeds — at-least-once delivery, made
  * effectively-once by an idempotent downstream (keep-latest upsert,
  * [[SnapshotLog.appendTxn]] keyed by the fed version range, ...).
  *
  * This is the tail-the-log loop that replaces re-scanning: a
  * downstream job over a 100 TB table reads only the files ADDED
  * since its cursor — KB-scale log metadata to plan, new-data-sized
  * scans to run. Delta's `readChangeFeed` + checkpoint offset, shaped
  * for this log.
  *
  * Retention contract: the cursor must stay within [[SnapshotLog.vacuum]]'s
  * retained window — a consumer paused past retention fails loudly on
  * its next poll (the expired log entry is gone) instead of silently
  * skipping commits; re-seed it with [[seek]] after a backfill.
  *
  * Crash-safety: the cursor write is tmp + rename (same primitive as
  * the commit log), so a torn write can't corrupt it; a crash between
  * processing and the cursor advance replays the batch — the
  * at-least-once half of the contract.
  */
object SnapshotFeed {

  private def feedDir(tableDir: String) = new Path(tableDir, "_graft_feed")

  private def cursorPath(tableDir: String, consumerId: String) = {
    require(consumerId.nonEmpty && !consumerId.exists(c => c == '/' || c == '.'),
      s"consumer id must be a plain name, got '$consumerId'")
    new Path(feedDir(tableDir), consumerId)
  }

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The consumer's last fully-processed version (0 = never ran:
    * the next poll feeds the whole table history).
    */
  def lastSeen(spark: SparkSession, tableDir: String,
      consumerId: String): Long = {
    val f = fs(spark, tableDir)
    val p = cursorPath(tableDir, consumerId)
    if (!f.exists(p)) return 0L
    val in = f.open(p)
    try {
      val buf = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      in.readFully(buf)
      new String(buf, "UTF-8").trim.toLong
    } finally in.close()
  }

  /** Force the cursor (initial seed after a backfill, or a deliberate
    * replay). tmp + rename, atomic on local disk and HDFS.
    */
  def seek(spark: SparkSession, tableDir: String, consumerId: String,
      version: Long): Unit = {
    val f = fs(spark, tableDir)
    f.mkdirs(feedDir(tableDir))
    val tmp = new Path(feedDir(tableDir),
      s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    val p = cursorPath(tableDir, consumerId)
    f.delete(p, false) // local rename cannot overwrite
    require(f.rename(tmp, p), s"cursor write failed: $p")
  }

  /** Rows committed after the cursor, stamped `_commit_version`, plus
    * the head version to pass to [[seek]]/[[process]]'s advance. Pure
    * read — the cursor does NOT move.
    */
  def poll(spark: SparkSession, tableDir: String,
      consumerId: String): (DataFrame, Long) = {
    val head = SnapshotLog.latestVersion(spark, tableDir).getOrElse(
      sys.error(s"$tableDir has no committed snapshot"))
    val from = lastSeen(spark, tableDir, consumerId)
    (SnapshotLog.changesBetween(spark, tableDir, math.min(from, head), head),
      head)
  }

  /** One feed iteration: poll, run `handle` on the new rows, then —
    * only if it returned normally — advance the cursor to the polled
    * head. Returns the number of versions consumed (0 = caught up,
    * `handle` not invoked).
    */
  def process(spark: SparkSession, tableDir: String, consumerId: String)(
      handle: DataFrame => Unit): Long = {
    val from = lastSeen(spark, tableDir, consumerId)
    val (batch, head) = poll(spark, tableDir, consumerId)
    if (head <= from) return 0L
    handle(batch)
    seek(spark, tableDir, consumerId, head)
    head - from
  }
}

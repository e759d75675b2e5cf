package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming jobs over the events stream — the engine's
  * incremental surface (SURVEY §2.1-H). The reference's `daily` mode
  * (updated_time watermark + re-fetch + overwrite upsert,
  * main_extractor.py:42-51,438-508) maps to:
  *
  *  - a file-source stream with event-time watermark (H1),
  *  - tumbling/sliding/session windowed aggregation (H2, Q20–Q22),
  *  - keep-latest-per-key upsert as *custom state* via
  *    `mapGroupsWithState` (H5 — the I-surface stateful operator).
  *
  * Scale notes: state is partitioned by key (one shuffle), watermark
  * bounds state size, `maxFilesPerTrigger` is the rate-control knob
  * (the analog of the reference's page/pause pacing H4).
  */
object Events {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  case class LatestState(event_id: Long, ts: java.sql.Timestamp, value: Double)

  /** File-source stream of the events table (nanos-safe read). */
  def stream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** H2: tumbling-day aggregation with a 1-day watermark (Q20 shape). */
  def tumblingDaily(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(DecimalType(18, 6))).as("sv"))

  /** H1: session windows with a 30-minute gap (Q22's streaming twin —
    * identical operator to the batch query, shared semantics).
    */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).as("sum_value"))

  /** H5: keep-latest-per-(user, type) upsert as explicit keyed state.
    * Emits the current winner on every update — the streaming form of
    * the daily-mode overwrite (and of batch Q19).
    */
  def dedupKeepLatest(events: Dataset[Event]): Dataset[(Long, String, LatestState)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: (Long, String), rows: Iterator[Event], state: GroupState[LatestState]) =>
          val incoming = rows.maxBy(e => (e.ts.getTime, e.event_id))
          val newer = state.getOption.forall { cur =>
            Ordering.Tuple2[Long, Long].lt(
              (cur.ts.getTime, cur.event_id),
              (incoming.ts.getTime, incoming.event_id))
          }
          val winner =
            if (newer) {
              val next = LatestState(incoming.event_id, incoming.ts, incoming.value)
              state.update(next)
              next
            } else state.get
          (key._1, key._2, winner)
      }
  }

  /** Drain a streaming DataFrame synchronously into a memory table and
    * return it (test/verify harness; production uses a parquet sink
    * with checkpointing).
    */
  def drainToMemory(df: DataFrame, mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val name = "drain_" + System.nanoTime()
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    df.sparkSession.table(name)
  }
}

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

  /** File-source stream of the events table (ts-shape-safe read:
    * [[graft.queries.Inventory.normalizeTs]] handles both the raw-nanos
    * and the micros-NTZ generations of the table).
    */
  def stream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.queries.Inventory.normalizeTs(spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
  }

  /** Batch read of the same table with the identical ts normalization —
    * the batch twins of the streaming jobs share one conversion.
    */
  def batch(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.queries.Inventory.normalizeTs(
      spark.read.parquet(s"$dir/events.parquet"))
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

  /** H5 (first-wins form): streaming ingest dedup via the built-in
    * `dropDuplicatesWithinWatermark` — each `event_id` is emitted once;
    * a replay of the same id arriving within the watermark horizon is
    * dropped, and the watermark EXPIRES the per-id state (bounded
    * memory — the property a plain streaming `dropDuplicates` lacks
    * and the reason it dies on an unbounded ingest). This is the
    * streaming twin of x20's incremental dedup: same question
    * ("have I ingested this already?"), state horizon traded for the
    * bloom's full-history sketch.
    */
  def dedupStreamingIngest(events: DataFrame,
      horizon: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

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

  case class OpenSession(start: Long, end: Long, n: Long, sum: Double)

  /** H1 + I-surface: gap-based sessionization that emits a session ONLY
    * once it is closed — either by a later event past the gap, or by
    * the event-time watermark passing `end + gap` (state timeout). The
    * `flatMapGroupsWithState` twin of [[sessions]]: `session_window`
    * re-emits the growing session on updates; this append-mode form
    * emits each session exactly once, which is the contract a
    * downstream "completed sessions" table wants.
    *
    * Scale: state per user is one (start, end, n, sum) tuple; the
    * watermark-driven timeout guarantees state is dropped as event time
    * advances, so state size tracks ACTIVE users, not stream length.
    */
  def closedSessions(events: Dataset[Event], gapMinutes: Int = 30)
      : Dataset[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    def emit(user: Long, s: OpenSession) =
      (user, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n, s.sum)
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(user, s))
          } else {
            // Out-of-order events within the watermark allowance are
            // legal: treat every event as an interval seed, union with
            // the open session from state, and interval-merge the
            // sorted set — a session absorbs a neighbor within the gap
            // on EITHER side (start moves back for late events; a late
            // event more than a gap before the open session forms its
            // own, already-closed session).
            val seeds = rows.map(e =>
              OpenSession(e.ts.getTime, e.ts.getTime, 1, e.value)).toSeq ++
              state.getOption
            val merged = seeds.sortBy(s => (s.start, s.end))
              .foldLeft(List.empty[OpenSession]) {
                case (cur :: done, s) if s.start - cur.end <= gapMs =>
                  OpenSession(cur.start, math.max(cur.end, s.end),
                    cur.n + s.n, cur.sum + s.sum) :: done
                case (acc, s) => s :: acc
              }.reverse
            val open = merged.last
            state.update(open)
            // timeout must stay ahead of the current watermark
            state.setTimeoutTimestamp(
              math.max(open.end + gapMs, state.getCurrentWatermarkMs() + 1))
            merged.init.iterator.map(emit(user, _))
          }
      }
  }

  /** Per-type monitor state for [[volumeMonitor]]: counters for days
    * the watermark has not yet closed, plus the exact
    * (days, sum, sum-of-squares) triple of every day already closed.
    * State size is O(open days) + 3 longs per event type — bounded by
    * the watermark, independent of stream length.
    */
  case class VolState(open: Map[Long, Long], d: Long, s: Long, q: Long)

  /** Streaming twin of batch x46: prequential daily-volume anomaly
    * detection. Each day's count is scored against the mean/stddev of
    * the days closed BEFORE it (so the monitor never peeks ahead —
    * exactly what a live ingest-health alert can know), then folded
    * into the running stats. A day closes, and is emitted exactly
    * once, when the event-time watermark passes its end; the z uses
    * the same exact-integer (count, sum, sum²) arithmetic as x46, and
    * degenerate history (<2 days, zero variance) pins z = 0.
    */
  def volumeMonitor(events: Dataset[Event])
      : Dataset[(String, java.sql.Timestamp, Long, Double, Int)] = {
    import events.sparkSession.implicits._
    val dayMs = 86400000L
    events
      .withWatermark("ts", "1 day")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (etype: String, rows: Iterator[Event], state: GroupState[VolState]) =>
          val st = state.getOption.getOrElse(VolState(Map.empty, 0L, 0L, 0L))
          val open = rows.foldLeft(st.open) { (m, e) =>
            val day = math.floorDiv(e.ts.getTime, dayMs) * dayMs
            m.updated(day, m.getOrElse(day, 0L) + 1L)
          }
          val wm = state.getCurrentWatermarkMs()
          val (closable, stillOpen) = open.partition {
            case (day, _) => day + dayMs <= wm
          }
          var (d, s, q) = (st.d, st.s, st.q)
          // close strictly in day order so the prequential stats are
          // deterministic regardless of how batches grouped the days
          val out = closable.toSeq.sortBy(_._1).map { case (day, n) =>
            val z =
              if (d > 1) {
                val mean = s.toDouble / d
                val variance = (q.toDouble - s.toDouble * s / d) / (d - 1)
                if (variance > 0.0) (n - mean) / math.sqrt(variance) else 0.0
              } else 0.0
            d += 1; s += n; q += n * n
            (etype, new java.sql.Timestamp(day), n, z,
              if (math.abs(z) > 2.0) 1 else 0)
          }
          state.update(VolState(stillOpen, d, s, q))
          // wake again when the earliest open day can close (timeout
          // must sit strictly ahead of the current watermark)
          val wake = (stillOpen.keys.map(_ + dayMs) ++ Seq(wm + dayMs)).min
          state.setTimeoutTimestamp(math.max(wake, wm + 1))
          out.iterator
      }
  }

  /** One SpaceSaving slot: the estimated count and its maximum
    * overestimation error (the evicted predecessor's count).
    */
  case class SSCounter(count: Long, err: Long)
  case class HHState(c: Map[Long, SSCounter])

  /** Streaming heavy hitters per event type via the SpaceSaving sketch
    * (Metwally et al., 2005): at most `capacity` counters per type —
    * O(1) state however long the stream runs — with the classic
    * guarantees: any user whose true count exceeds N/capacity is
    * tracked, every estimate over-counts by at most its recorded
    * `err`, and the counter totals sum exactly to the items seen.
    * Each micro-batch emits the current top-k (update mode) —
    * the "who is hammering the ingest" live view that an exact
    * groupBy-count can only answer with unbounded state.
    */
  def heavyHitters(events: Dataset[Event], capacity: Int = 8, k: Int = 3)
      : Dataset[(String, Int, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (etype: String, rows: Iterator[Event], state: GroupState[HHState]) =>
          var c = state.getOption.map(_.c).getOrElse(Map.empty[Long, SSCounter])
          rows.foreach { e =>
            c.get(e.user_id) match {
              case Some(sc) =>
                c = c.updated(e.user_id, sc.copy(count = sc.count + 1))
              case None if c.size < capacity =>
                c = c.updated(e.user_id, SSCounter(1L, 0L))
              case None =>
                // evict the smallest counter (ties to the smallest id)
                // and inherit its count as the newcomer's error bound
                val (mu, msc) = c.minBy { case (u, sc) => (sc.count, u) }
                c = (c - mu).updated(e.user_id, SSCounter(msc.count + 1, msc.count))
            }
          }
          state.update(HHState(c))
          c.toSeq.sortBy { case (u, sc) => (-sc.count, u) }.take(k).zipWithIndex
            .map { case ((u, sc), i) => (etype, i + 1, u, sc.count, sc.err) }
            .iterator
      }
  }

  /** Batch twin of [[volumeMonitor]]: the same prequential z per
    * (type, day) computed with event_type-partitioned windows over the
    * daily counts (prior-days-only frames). Used by the spec to pin
    * stream ≡ batch on the real events table; also the backfill job a
    * deployment runs to score history before the stream takes over.
    */
  def volumeMonitorBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val prior = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    daily
      .withColumn("d", count(lit(1)).over(prior))
      .withColumn("s", sum(col("n")).over(prior))
      .withColumn("q", sum(col("n") * col("n")).over(prior))
      .withColumn("z",
        when(col("d") > 1, {
          val mean = col("s").cast(DoubleType) / col("d")
          val variance = (col("q").cast(DoubleType) -
            col("s").cast(DoubleType) * col("s") / col("d")) / (col("d") - 1)
          when(variance > 0.0, (col("n") - mean) / sqrt(variance))
            .otherwise(lit(0.0))
        }).otherwise(lit(0.0)))
      .select(col("event_type"), col("day"), col("n"), col("z"),
        (abs(col("z")) > 2.0).cast(IntegerType).as("is_spike"))
  }

  /** H-surface extension the reference's pause-bound poller never
    * needed but a lake-scale enrichment does: a stream-stream interval
    * join. Each purchase joins the same user's clicks from the
    * trailing 30 minutes. Both sides carry a 1-hour watermark and the
    * join condition bounds event time on both ends, so Spark can age
    * buffered rows out of the join state — per-key state is bounded by
    * watermark + interval, never the whole stream.
    *
    * Works unchanged on a BATCH frame (watermarks are a no-op there),
    * which is exactly how the equivalence test pins the semantics.
    */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
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

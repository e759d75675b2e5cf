package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Events

/** Streaming-vs-batch equivalence for the library jobs (beyond Q28's
  * driver-checked tumbling case).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("streaming sessions == batch session_window") {
    val streamed = Events.drainToMemory(
        Events.sessions(Events.stream(spark, sf)))
      .select(col("user_id"), col("sw.start").as("s"), col("n_events"),
        col("sum_value").cast("double"))
      .orderBy("user_id", "s").collect().toSeq
    val batch = graft.queries.Inventory.q22(spark, sf)
      .select(col("user_id"), to_timestamp(col("session_start")).as("s"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "s").collect().toSeq
    assert(streamed == batch)
  }

  test("closedSessions emits once per session: in-batch gap and watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Events.Event]
    def ev(id: Long, min: Long, user: Long, v: Double) =
      Events.Event(id, new java.sql.Timestamp(min * 60000L), user, "view", v, "{}")
    val out = Events.closedSessions(input.toDS(), gapMinutes = 30)
      .toDF("user_id", "start", "end", "n", "sum")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("closed_sessions").start()
    try {
      // batch 1: user 1 has two events 10 min apart -> one open session
      // (times sit well above epoch 0 — an event at exactly the initial
      // watermark would be dropped as late by the stateful operator)
      input.addData(ev(1, 1000, 1L, 1.0), ev(2, 1010, 1L, 2.0))
      q.processAllAvailable()
      assert(spark.table("closed_sessions").count() == 0) // still open
      // batch 2: an OUT-OF-ORDER user-1 event at t=995min (watermark is
      // only 950min, so it is legal late data) must extend the open
      // session backwards, plus user 2 at t=1400min pushes the
      // watermark to 1340min, past user 1's (end=1010)+gap=30min timeout
      input.addData(ev(5, 995, 1L, 1.5), ev(3, 1400, 2L, 5.0))
      q.processAllAvailable()
      // batch 3: any further data triggers timeout processing
      input.addData(ev(4, 1410, 2L, 0.5))
      q.processAllAvailable()
      val rows = spark.table("closed_sessions")
        .select("user_id", "start", "n", "sum").collect().map(r =>
          (r.getLong(0), r.getTimestamp(1).getTime / 60000L,
            r.getLong(2), r.getDouble(3))).toSet
      // exactly one session for user 1, start moved back to the late event
      assert(rows == Set((1L, 995L, 3L, 4.5)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark ingest dedup: replays dropped, state expires") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Events.Event]
    def ev(id: Long, min: Long, v: Double) =
      Events.Event(id, new java.sql.Timestamp(min * 60000L), 1L, "view", v, "{}")
    val out = Events.dedupStreamingIngest(input.toDF(), horizon = "30 minutes")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("stream_dedup").start()
    try {
      // batch 1: id 10 arrives twice in-batch (value differs) + id 11
      input.addData(ev(10, 1000, 1.0), ev(10, 1000, 9.9), ev(11, 1005, 2.0))
      q.processAllAvailable()
      // batch 2: id 10 REPLAYED within the horizon -> dropped; id 12
      // advances the watermark far past 1000+30min, expiring id 10's
      // dedup state
      input.addData(ev(10, 1001, 7.7), ev(12, 2000, 3.0))
      q.processAllAvailable()
      // batch 3: id 10 again, now BEYOND the expired horizon -> re-admitted
      // (bounded state means horizon-scoped dedup, x20 covers full history)
      input.addData(ev(10, 2001, 5.0))
      q.processAllAvailable()
      val ids = spark.table("stream_dedup")
        .groupBy("event_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ids(11L) == 1 && ids(12L) == 1)
      assert(ids(10L) == 2) // once per horizon window, not three times
    } finally q.stop()
  }

  test("stateful dedupKeepLatest matches batch Q19 winners") {
    import spark.implicits._
    val events = Events.stream(spark, sf).as[Events.Event]
    val streamed = Events.drainToMemory(
        Events.dedupKeepLatest(events).toDF("user_id", "event_type", "latest"),
        OutputMode.Update())
    // Update-mode emits intermediate winners; keep the final row per key
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("latest.ts").desc, col("latest.event_id").desc)
    val finalRows = streamed
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("latest.event_id").as("event_id"))
      .orderBy("user_id", "event_type").collect().toSeq
    val batch = graft.queries.Inventory.q19(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"))
      .orderBy("user_id", "event_type").collect().toSeq
    assert(finalRows == batch)
  }

  test("stream-stream purchase-click interval join == batch join") {
    val streamed = Events.drainToMemory(
        Events.purchaseClickJoin(Events.stream(spark, sf)),
        OutputMode.Append())
      .orderBy("purchase_id", "click_id").collect().toSeq
    // the SAME operator over the batch read is the semantic twin
    // (watermarks no-op in batch)
    val batch = Events.purchaseClickJoin(Events.batch(spark, sf))
      .orderBy("purchase_id", "click_id").collect().toSeq
    assert(batch.nonEmpty, "fixture must produce purchase-click matches")
    assert(streamed == batch)
  }

  test("volumeMonitor closes days in order and scores against prior history only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Events.Event]
    val dayMs = 86400000L
    var id = 0L
    def ev(day: Long) = { // noon of the given epoch day
      id += 1
      Events.Event(id, new java.sql.Timestamp(day * dayMs + dayMs / 2),
        1L, "view", 1.0, "{}")
    }
    val out = Events.volumeMonitor(input.toDS())
      .toDF("event_type", "day", "n", "z", "is_spike")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("vol_monitor").start()
    try {
      // day1 x3, day2 x2 -> watermark (day2 noon - 1d) closes nothing
      input.addData(ev(1), ev(1), ev(1), ev(2), ev(2))
      q.processAllAvailable()
      assert(spark.table("vol_monitor").count() == 0)
      // day5 advances the watermark to day4 noon mid-next-batch
      input.addData(ev(5))
      q.processAllAvailable()
      // day6: closes day1 (no history, z=0) and day2 (1 day history, z=0)
      input.addData(ev(6))
      q.processAllAvailable()
      // day8: closes day5 (n=1 vs history mean 2.5, sd sqrt(.5) -> spike)
      input.addData(ev(8))
      q.processAllAvailable()
      // day10: closes day6 (n=1 vs mean 2, sd 1 -> z=-1, no spike); the
      // trailing watermark-advance batch then closes day8 too
      // (history {3,2,1,1}: mean 1.75, var 11/12 -> z=-0.7833)
      input.addData(ev(10))
      q.processAllAvailable()
      val rows = spark.table("vol_monitor").collect().map { r =>
        (r.getTimestamp(1).getTime / dayMs, r.getLong(2),
          math.rint(r.getDouble(3) * 1e4) / 1e4, r.getInt(4))
      }.toSet
      val zDay5 = math.rint((1.0 - 2.5) / math.sqrt(0.5) * 1e4) / 1e4
      val zDay8 = math.rint((1.0 - 1.75) / math.sqrt(11.0 / 12.0) * 1e4) / 1e4
      assert(rows == Set(
        (1L, 3L, 0.0, 0), (2L, 2L, 0.0, 0),
        (5L, 1L, zDay5, 1), (6L, 1L, -1.0, 0), (8L, 1L, zDay8, 0)))
    } finally q.stop()
  }

  test("volumeMonitor == batch prequential twin for every watermark-closed day") {
    import spark.implicits._
    val streamed = Events.drainToMemory(
        Events.volumeMonitor(Events.stream(spark, sf).as[Events.Event])
          .toDF("event_type", "day", "n", "z", "is_spike"),
        OutputMode.Append())
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getDouble(3), r.getInt(4))).toSet
    assert(streamed.nonEmpty, "the watermark must close at least one day")
    val batch = Events.volumeMonitorBatch(Events.batch(spark, sf))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getDouble(3), r.getInt(4))).toSet
    // the stream emits the subset of days its final watermark closed;
    // every emitted row must agree exactly with the batch twin
    assert(streamed.subsetOf(batch),
      s"stream rows not in batch twin: ${streamed.diff(batch).take(3)}")
  }

  test("heavyHitters: SpaceSaving guarantees under eviction pressure") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Events.Event]
    var id = 0L
    def ev(user: Long) = {
      id += 1
      Events.Event(id, new java.sql.Timestamp(86400000L + id * 1000), user,
        "view", 1.0, "{}")
    }
    // one dominant user (30 hits) + 16 distinct light users (2 each),
    // interleaved, against capacity 8 -> constant eviction churn
    val light = (100L to 115L).flatMap(u => Seq(ev(u), ev(u)))
    val heavy = (1 to 30).map(_ => ev(1L))
    val mixed = heavy.zipAll(light, null, null)
      .flatMap { case (a, b) => Seq(a, b).filter(_ != null) }
    val out = Events.heavyHitters(input.toDS(), capacity = 8, k = 8)
      .toDF("event_type", "rank", "user_id", "est", "err")
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("heavy_hitters").start()
    try {
      input.addData(mixed: _*)
      q.processAllAvailable()
      val rows = spark.table("heavy_hitters").collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(rows.length == 8, "k=capacity exposes the full sketch")
      // guarantee 1: the true heavy hitter (30 > 62/8) is tracked at rank 1
      val top = rows.find(_._1 == 1).get
      assert(top._2 == 1L, s"user 1 must lead, got $rows")
      // guarantee 2: estimates bracket the truth: est-err <= 30 <= est
      assert(top._3 - top._4 <= 30L && 30L <= top._3)
      // guarantee 3: counter totals sum exactly to the items seen
      assert(rows.map(_._3).sum == mixed.length)
    } finally q.stop()
  }

  test("LakeSink commits each micro-batch once; replayed batch ids skip") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lake = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Events.Event]
    def ev(id: Long, day: Int) = Events.Event(
      id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"),
      1L, "view", 1.0, "{}")
    val q = graft.streaming.LakeSink.start(input.toDS().toDF(), lake)
    try {
      input.addData(ev(1, 1), ev(2, 1), ev(3, 2))
      q.processAllAvailable()
      input.addData(ev(4, 2))
      q.processAllAvailable()
    } finally q.stop()
    val lakeRows = spark.read.parquet(lake)
    assert(lakeRows.count() == 4)
    assert(lakeRows.select("ingest_date").distinct().count() == 2)
    // a replayed batch id must be a no-op even with new data attached
    val replay = Seq(ev(9, 3)).toDF()
    assert(!graft.streaming.LakeSink.commitBatch(replay, lake, "events", 0L))
    assert(spark.read.parquet(lake).count() == 4)
    // a fresh batch id commits and the manifest saw every commit
    assert(graft.streaming.LakeSink.commitBatch(replay, lake, "events", 99L))
    assert(spark.read.parquet(lake).count() == 5)
    assert(graft.ingest.Manifest.history(replay, lake, "events").size == 3)
  }

  test("SnapshotSink commits micro-batches as snapshot versions, exactly once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.SnapshotLog
    val tbl = java.nio.file.Files.createTempDirectory("graft-snapsink")
      .toString + "/t"
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Events.Event]
    def ev(id: Long, day: Int) = Events.Event(
      id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"),
      1L, "view", 1.0, "{}")
    val q = graft.streaming.SnapshotSink.start(input.toDS().toDF(), tbl, appId = "events-sink")
    try {
      input.addData(ev(1, 1), ev(2, 1))
      q.processAllAvailable()
      input.addData(ev(3, 2))
      q.processAllAvailable()
    } finally q.stop()
    assert(SnapshotLog.read(spark, tbl).count() == 3)
    val head = SnapshotLog.latestVersion(spark, tbl).get
    // a crash-replayed batch id is a committed no-op, not a duplicate —
    // even with different data attached (the checkpoint contract says
    // same id ⇒ same batch, so the txn map may discard it)
    val replay = Seq(ev(9, 3)).toDF()
    assert(SnapshotLog.appendTxn(replay, tbl, Nil, "events-sink", 0L) == head)
    assert(SnapshotLog.read(spark, tbl).count() == 3)
    // the next batch id commits one new version
    assert(SnapshotLog.appendTxn(replay, tbl, Nil, "snapshot-sink", 2L) == head + 1)
    assert(SnapshotLog.read(spark, tbl).count() == 4)
  }

  test("AnnIndex.appendStream keeps the index fresh per micro-batch; the " +
      "batch-id ledger skips replays") {
    import graft.operators.AnnIndex
    val vectors = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val cents = vectors.filter(col("vec_id").between(1, 8))
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val root = java.nio.file.Files.createTempDirectory("graft-annstream").toString
    val path = root + "/index"
    val base = vectors.filter(col("vec_id") % 5 =!= 4)
    val inc = vectors.filter(col("vec_id") % 5 === 4)
    AnnIndex.build(base, cents, path)
    val feed = root + "/feed"
    new java.io.File(feed).mkdirs()
    val q = AnnIndex.appendStream(
      spark.readStream.schema(vectors.schema)
        .option("maxFilesPerTrigger", 1).parquet(feed),
      cents, path, root + "/ckpt")
    try {
      // wave 1: two files -> batches 0 and 1, each appended once
      inc.filter(col("vec_id") < 200).coalesce(1)
        .write.mode("append").parquet(feed)
      inc.filter(col("vec_id").between(200, 299)).coalesce(1)
        .write.mode("append").parquet(feed)
      q.processAllAvailable()
      val n1 = spark.read.parquet(path).count()
      assert(n1 == base.count() + inc.filter(col("vec_id") < 300).count(),
        "each micro-batch lands exactly once")
      // ledger markers live under the CHECKPOINT's namespace (ADVICE
      // r12: batch ids are checkpoint-scoped)
      val ledgerDir = graft.streaming.StreamLedger.dir(
        org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration),
        new org.apache.hadoop.fs.Path(path), root + "/ckpt").toUri.getPath
      assert(new java.io.File(ledgerDir, "batch-0").exists &&
        new java.io.File(ledgerDir, "batch-1").exists,
        "ledger markers written after the data")
      // replay simulation: batch id 2 is already marked in the ledger
      // (as after a crash between marker write and checkpoint commit),
      // so the next delivered micro-batch must SKIP instead of
      // duplicating its vectors
      new java.io.File(ledgerDir, "batch-2").createNewFile()
      inc.filter(col("vec_id").between(300, 399)).coalesce(1)
        .write.mode("append").parquet(feed)
      q.processAllAvailable()
      assert(spark.read.parquet(path).count() == n1,
        "a ledger-marked batch id must not append again")
      // the following batch (id 3) is unmarked and lands normally
      inc.filter(col("vec_id") >= 400).coalesce(1)
        .write.mode("append").parquet(feed)
      q.processAllAvailable()
      val index = spark.read.parquet(path)
      val expected = vectors.filter(
        col("vec_id") % 5 =!= 4 || col("vec_id") < 300 || col("vec_id") >= 400)
      assert(index.count() == expected.count())
      assert(index.select("vec_id").distinct().count() == index.count(),
        "no vector duplicated across the stream lifecycle")
      // stream-maintained assignment == batch build, cell for cell
      val pBatch = root + "/batch"
      AnnIndex.build(expected, cents, pBatch)
      def cells(p: String) = spark.read.parquet(p)
        .select(col("vec_id").cast("long"), col("cell").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cells(path) == cells(pBatch),
        "streaming maintenance must converge to the batch layout")
    } finally q.stop()
  }

  test("streaming asset decode sees incremental file arrivals exactly once") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-assets-inc").toString
    Multimodal.writeAssetFiles(docs, dir, maxDocs = 30)
    val q = Multimodal.streamAssetFeatures(spark, dir, maxFilesPerTrigger = 7)
      .writeStream.outputMode("append").format("memory")
      .queryName("asset_inc").start()
    try {
      q.processAllAvailable()
      val n1 = spark.table("asset_inc").count()
      // second wave: ids 31..60 are NEW paths; 0..30 are rewritten with
      // identical bytes — the file source's seen-path tracking must not
      // re-emit them (exactly-once per asset)
      Multimodal.writeAssetFiles(docs, dir, maxDocs = 60)
      q.processAllAvailable()
      val streamed = spark.table("asset_inc")
      assert(streamed.count() > n1, "second wave must arrive")
      assert(streamed.select("doc_id").distinct().count() == streamed.count(),
        "no asset may be decoded twice across waves")
      // the drained stream equals the batch decode over the final dir
      val batch = Multimodal.extractFeaturesFromFiles(spark, dir)
      assert(streamed.select("doc_id", "mime", "byte_len", "content_hash",
          "fake_width", "fake_height").collect().toSet ==
        batch.toDF().select("doc_id", "mime", "byte_len", "content_hash",
          "fake_width", "fake_height").collect().toSet,
        "stream == batch over the same fixture")
    } finally q.stop()
  }

  test("MinhashSignatureStore.dedupStream verdicts == the x71 batch " +
      "lifecycle, row for row") {
    import graft.queries.Extras
    val batchRows = Extras.x71IncrementalMinhash(spark, sf).collect().toSeq
    val streamRows = Extras.x75StreamDedup(spark, sf).collect().toSeq
    assert(streamRows == batchRows,
      "streaming the ingest batches must not change a single verdict")
    // the lifecycle is non-degenerate on this fixture: something dropped
    assert(batchRows.exists(!_.getBoolean(2)))
  }

  test("dedupStream in VerdictOnly mode == the x78 batch lifecycle, row " +
      "for row (VERDICT r13 #1: the production keep/drop stream)") {
    import graft.operators.MinhashSignatureStore
    import graft.queries.Extras
    // the batch twin: x78's store-build + two dedupVerdicts legs
    val batchRows = Extras.x78DedupVerdicts(spark, sf).collect().toSeq
    // the streamed run: same history store, same two batches arriving
    // as files, probed through dedupStream(mode = VerdictOnly)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val hist = docs.filter(col("doc_id") % 4 === 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft-mssvstream").toString
    val store = root + "/store"
    val (nh, nb) = Extras.minhashSchemeFor(hist.count())
    MinhashSignatureStore.build(spark, hist, store, nh, nb, Extras.Perms)
    val feed = root + "/feed"
    new java.io.File(feed).mkdirs()
    val q = MinhashSignatureStore.dedupStream(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(feed),
      store, root + "/verdicts", Extras.Perms,
      Extras.MinhashJaccardThreshold, root + "/ckpt",
      MinhashSignatureStore.VerdictOnly)
    try {
      docs.filter(col("doc_id") % 8 === 1).coalesce(1)
        .write.mode("append").parquet(feed)
      q.processAllAvailable()
      docs.filter(col("doc_id") % 8 === 5).coalesce(1)
        .write.mode("append").parquet(feed)
      q.processAllAvailable()
    } finally q.stop()
    val streamRows = spark.read.parquet(root + "/verdicts/batch-0")
      .withColumn("batch", lit("b1"))
      .unionByName(spark.read.parquet(root + "/verdicts/batch-1")
        .withColumn("batch", lit("b2")))
      .select(col("doc_id"), col("batch"), col("keep"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(streamRows == batchRows,
      "the verdict-only stream must not change a single keep/drop")
    assert(batchRows.exists(!_.getBoolean(2)), "fixture is non-degenerate")
    // the verdict-only schema really is the slim one (no census stats)
    assert(spark.read.parquet(root + "/verdicts/batch-0")
      .schema.fieldNames.toSeq == Seq("doc_id", "keep"))
  }

  test("rebuildIfOutgrown between stream runs: the ledger survives the " +
      "scheme swap and the resumed stream probes under the new scheme") {
    import graft.operators.MinhashSignatureStore
    import graft.queries.Extras
    val T = Extras.MinhashJaccardThreshold
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val hist = docs.filter(col("doc_id") % 4 === 0)
    val b1 = docs.filter(col("doc_id") % 8 === 1)
    val b2 = docs.filter(col("doc_id") % 8 === 5)
    val root = java.nio.file.Files
      .createTempDirectory("graft-mssrebuild").toString
    val store = root + "/store"
    // deliberately undersized scheme: the occupancy policy below will
    // demand the upgrade once b1's keepers land
    MinhashSignatureStore.build(spark, hist, store, 16, 4, Extras.Perms)
    val feed = root + "/feed"
    new java.io.File(feed).mkdirs()
    def startStream() = MinhashSignatureStore.dedupStream(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(feed),
      store, root + "/verdicts", Extras.Perms, T, root + "/ckpt")
    // run 1: batch 0 probes and appends under the 16/4 scheme
    val q1 = startStream()
    try {
      b1.coalesce(1).write.mode("append").parquet(feed)
      q1.processAllAvailable()
    } finally q1.stop()
    val ledger = new java.io.File(graft.streaming.StreamLedger.dir(
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(store), root + "/ckpt").toUri.getPath)
    assert(new java.io.File(ledger, "batch-0").exists)
    val keptB1 = spark.read.parquet(root + "/verdicts/batch-0")
      .filter(col("keep")).count()
    // between-runs maintenance: the store outgrew 16/4 -> rebuild
    val policy = (n: Long) => if (n <= 2) (16, 4) else (48, 8)
    assert(MinhashSignatureStore.rebuildIfOutgrown(
      spark, store, Extras.Perms, policy), "the store must rebuild")
    assert(MinhashSignatureStore.readScheme(spark, store) === ((48, 8)))
    assert(new java.io.File(ledger, "batch-0").exists,
      "the rebuild swap must not touch the stream ledger")
    // run 2: SAME checkpoint — batch 0 is not replayed, batch 1 (b2)
    // probes under the rebuilt scheme
    val q2 = startStream()
    try {
      b2.coalesce(1).write.mode("append").parquet(feed)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(root + "/verdicts/batch-0")
      .filter(col("keep")).count() == keptB1,
      "the resumed stream must not reprocess the pre-rebuild batch")
    // equivalence oracle: a batch-built 48/8 store over history + b1's
    // keepers must give b2 the exact same verdicts
    val refStore = root + "/refstore"
    val keptIds = spark.read.parquet(root + "/verdicts/batch-0")
      .filter(col("keep")).select(col("doc_id"))
    MinhashSignatureStore.build(spark,
      hist.unionByName(b1.join(keptIds, Seq("doc_id"), "left_semi")),
      refStore, 48, 8, Extras.Perms)
    val expected = MinhashSignatureStore.dedupAgainst(
        spark, b2, refStore, Extras.Perms, T)
      .orderBy(col("doc_id")).collect().toSeq
    val got = spark.read.parquet(root + "/verdicts/batch-1")
      .orderBy(col("doc_id")).collect().toSeq
    assert(got == expected,
      "the resumed stream's probe must equal a fresh build at the new scheme")
  }

  test("rebuildIfOutgrown between stream runs keeps a VerdictOnly " +
      "stream on the cheap verdict-only probe under the new scheme " +
      "(VERDICT r14 #7)") {
    import graft.operators.MinhashSignatureStore
    import graft.queries.Extras
    val T = Extras.MinhashJaccardThreshold
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val hist = docs.filter(col("doc_id") % 4 === 0)
    val b1 = docs.filter(col("doc_id") % 8 === 1)
    val b2 = docs.filter(col("doc_id") % 8 === 5)
    val root = java.nio.file.Files
      .createTempDirectory("graft-mssrebuildv").toString
    val store = root + "/store"
    MinhashSignatureStore.build(spark, hist, store, 16, 4, Extras.Perms)
    val feed = root + "/feed"
    new java.io.File(feed).mkdirs()
    def startStream() = MinhashSignatureStore.dedupStream(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(feed),
      store, root + "/verdicts", Extras.Perms, T, root + "/ckpt",
      MinhashSignatureStore.VerdictOnly)
    val q1 = startStream()
    try {
      b1.coalesce(1).write.mode("append").parquet(feed)
      q1.processAllAvailable()
    } finally q1.stop()
    val policy = (n: Long) => if (n <= 2) (16, 4) else (48, 8)
    assert(MinhashSignatureStore.rebuildIfOutgrown(
      spark, store, Extras.Perms, policy), "the store must rebuild")
    assert(MinhashSignatureStore.readScheme(spark, store) === ((48, 8)))
    val q2 = startStream()
    try {
      b2.coalesce(1).write.mode("append").parquet(feed)
      q2.processAllAvailable()
    } finally q2.stop()
    // the post-rebuild micro-batch stayed on the verdict-only probe:
    // its output is the slim schema, not the census one
    assert(spark.read.parquet(root + "/verdicts/batch-1")
      .schema.fieldNames.toSeq == Seq("doc_id", "keep"),
      "a VerdictOnly stream must stay verdict-only across a rebuild")
    // equivalence oracle: verdict-only probe against a fresh 48/8
    // store over history + b1's keepers gives b2 the same verdicts
    val refStore = root + "/refstore"
    val keptIds = spark.read.parquet(root + "/verdicts/batch-0")
      .filter(col("keep")).select(col("doc_id"))
    MinhashSignatureStore.build(spark,
      hist.unionByName(b1.join(keptIds, Seq("doc_id"), "left_semi")),
      refStore, 48, 8, Extras.Perms)
    val expected = MinhashSignatureStore.dedupVerdicts(
        spark, b2, refStore, Extras.Perms, T)
      .orderBy(col("doc_id")).collect().toSeq
    val got = spark.read.parquet(root + "/verdicts/batch-1")
      .orderBy(col("doc_id")).collect().toSeq
    assert(got == expected,
      "post-rebuild VerdictOnly probe must equal a fresh build's verdicts")
  }

  test("dedupStream's batch-id ledger skips replayed batches; unmarked " +
      "batches land normally") {
    import graft.operators.MinhashSignatureStore
    import graft.queries.Extras
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-mssstream").toString
    val store = root + "/store"
    MinhashSignatureStore.build(spark,
      docs.filter(col("doc_id") % 2 === 0), store, 16, 4, Extras.Perms)
    val histDocs = spark.read.parquet(store + "/docs").count()
    val feed = root + "/feed"
    new java.io.File(feed).mkdirs()
    val q = MinhashSignatureStore.dedupStream(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(feed),
      store, root + "/verdicts", Extras.Perms,
      Extras.MinhashJaccardThreshold, root + "/ckpt")
    try {
      // batch id 0 is pre-marked (as after a crash between marker write
      // and checkpoint commit): the delivered batch must be SKIPPED —
      // no verdicts, no append. Markers live under this checkpoint's
      // ledger namespace (ADVICE r12).
      val ledger = new java.io.File(graft.streaming.StreamLedger.dir(
        org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration),
        new org.apache.hadoop.fs.Path(store), root + "/ckpt").toUri.getPath)
      ledger.mkdirs()
      new java.io.File(ledger, "batch-0").createNewFile()
      docs.filter(col("doc_id") % 4 === 1).coalesce(1)
        .write.mode("append").parquet(feed)
      q.processAllAvailable()
      assert(!new java.io.File(root + "/verdicts/batch-0").exists,
        "a ledger-marked batch id must not probe again")
      assert(spark.read.parquet(store + "/docs").count() == histDocs,
        "a ledger-marked batch id must not append again")
      // the following batch (id 1) is unmarked: verdicts land and the
      // kept docs grow the store
      docs.filter(col("doc_id") % 4 === 3).coalesce(1)
        .write.mode("append").parquet(feed)
      q.processAllAvailable()
      val v1 = spark.read.parquet(root + "/verdicts/batch-1")
      assert(v1.count() == docs.filter(col("doc_id") % 4 === 3).count())
      val kept = v1.filter(col("keep")).count()
      assert(spark.read.parquet(store + "/docs").count() == histDocs + kept,
        "exactly the kept docs append")
      assert(new java.io.File(ledger, "batch-1").exists,
        "the processed batch commits its marker")
    } finally q.stop()

    // A FRESH checkpoint pointed at the same store restarts batch ids
    // at 0 — its batches must PROCESS, not be skipped by the previous
    // query's markers (ADVICE r12: the un-namespaced ledger silently
    // lost exactly these batches)
    val feed2 = root + "/feed2"
    new java.io.File(feed2).mkdirs()
    val q2 = MinhashSignatureStore.dedupStream(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(feed2),
      store, root + "/verdicts2", Extras.Perms,
      Extras.MinhashJaccardThreshold, root + "/ckpt2")
    try {
      docs.filter(col("doc_id") % 8 === 5).coalesce(1)
        .write.mode("append").parquet(feed2)
      q2.processAllAvailable()
      assert(new java.io.File(root + "/verdicts2/batch-0").exists,
        "a fresh checkpoint's batch 0 must not be skipped by the old " +
          "query's ledger")
    } finally q2.stop()
  }

  test("optimize between ANN stream runs: the ledger survives the cell " +
      "swap and the resumed stream probes the post-split layout with " +
      "the refreshed centroids") {
    import graft.operators.AnnIndex
    import graft.queries.Extras
    val tau = Extras.EmbedCosThreshold
    val vectors = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val cents = vectors.filter(col("vec_id").between(1, 8))
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val pool = vectors.filter(col("vec_id") >= 17)
    val hist = pool.filter(col("vec_id") % 2 === 0)
    val b1 = pool.filter(col("vec_id") % 4 === 1)
    val b2 = pool.filter(col("vec_id") % 4 === 3)
    val root = java.nio.file.Files
      .createTempDirectory("graft-annoptstream").toString
    val idx = root + "/index"
    AnnIndex.build(hist, cents, idx)
    val feed = root + "/feed"
    new java.io.File(feed).mkdirs()
    def startStream(c: org.apache.spark.sql.DataFrame) =
      AnnIndex.dedupStream(
        spark.readStream.schema(pool.schema)
          .option("maxFilesPerTrigger", 1).parquet(feed),
        idx, root + "/verdicts", c, nprobe = 2, tau, root + "/ckpt")
    // run 1: batch 0 probes and appends under the 8 seed cells
    val q1 = startStream(cents)
    try {
      b1.coalesce(1).write.mode("append").parquet(feed)
      q1.processAllAvailable()
    } finally q1.stop()
    val ledger = new java.io.File(graft.streaming.StreamLedger.dir(
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(idx), root + "/ckpt").toUri.getPath)
    assert(new java.io.File(ledger, "batch-0").exists)
    val keptB1 = spark.read.parquet(root + "/verdicts/batch-0")
      .filter(col("keep")).count()
    // between-runs maintenance: split the hot cells (the x65c hook)
    val maxOcc = 16L
    val refreshed = AnnIndex.optimize(spark, idx, cents, maxOcc)
      .localCheckpoint(true)
    assert(refreshed.count() > cents.count(),
      "fixture must actually split at this occupancy")
    assert(new java.io.File(ledger, "batch-0").exists,
      "the optimize swap must not touch the stream ledger")
    // run 2: SAME checkpoint, REFRESHED centroids (the production
    // resume contract) — batch 0 is not replayed, batch 1 (b2)
    // probes the post-split layout
    val q2 = startStream(refreshed)
    try {
      b2.coalesce(1).write.mode("append").parquet(feed)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(root + "/verdicts/batch-0")
      .filter(col("keep")).count() == keptB1,
      "the resumed stream must not reprocess the pre-optimize batch")
    // equivalence oracle: replay the lifecycle in batch — build at the
    // seed cells over history + b1's keepers, optimize with the same
    // occupancy (deterministic: same content, same args, same splits),
    // probe b2 against THAT. Any divergence in the resumed stream's
    // layout, centroid set, or verdicts shows up row-for-row.
    val refIdx = root + "/refindex"
    val keptIds = spark.read.parquet(root + "/verdicts/batch-0")
      .filter(col("keep")).select(col("vec_id"))
    AnnIndex.build(
      hist.unionByName(b1.join(keptIds, Seq("vec_id"), "left_semi")),
      cents, refIdx)
    val refCents = AnnIndex.optimize(spark, refIdx, cents, maxOcc)
    val expected = AnnIndex.dedupAgainst(
        spark, refIdx, b2, refCents, nprobe = 2, tau)
      .orderBy(col("vec_id")).collect().toSeq
    val got = spark.read.parquet(root + "/verdicts/batch-1")
      .orderBy(col("vec_id")).collect().toSeq
    assert(got == expected,
      "the resumed stream's probe must equal a fresh build + optimize")
  }

  test("AnnIndex.dedupStream == the x79 batch dedup lifecycle, row for " +
      "row (x80: the streaming leg of cross-run semantic dedup)") {
    import graft.queries.Extras
    // the two public queries run the IDENTICAL lifecycle — x79 hands
    // the batches to dedupAgainst/append directly, x80 lands them as
    // files in a watched dir and lets dedupStream drive the same
    // probe-write-append sequence per micro-batch; any divergence
    // (ordering, ledger, verdict materialization) shows up as a row
    val batchRows = Extras.x79SemdedupIncremental(spark, sf).collect().toSeq
    val streamRows = Extras.x80SemdedupStream(spark, sf).collect().toSeq
    assert(streamRows == batchRows,
      "streaming the ingest batches must not change a single verdict")
    // non-degenerate: the sf0.001 fixture drops at least one vector
    assert(batchRows.exists(!_.getBoolean(2)),
      "fixture must exercise a drop")
  }

  test("AnnIndex.dedupStream in VerdictOnly mode == the x81 batch " +
      "lifecycle, row for row (the production keep/drop stream for " +
      "embeddings)") {
    import graft.operators.AnnIndex
    import graft.queries.Extras
    val batchRows = Extras.x81SemdedupVerdicts(spark, sf).collect().toSeq
    val vectors = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val cents = vectors.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val pool = vectors.filter(col("vec_id") >= 17)
    val root = java.nio.file.Files
      .createTempDirectory("graft-annvstream").toString
    val idx = root + "/index"
    AnnIndex.build(pool.filter(col("vec_id") % 2 === 0), cents, idx)
    val feed = root + "/feed"
    new java.io.File(feed).mkdirs()
    val q = AnnIndex.dedupStream(
      spark.readStream.schema(pool.schema)
        .option("maxFilesPerTrigger", 1).parquet(feed),
      idx, root + "/verdicts", cents, nprobe = 2,
      Extras.EmbedCosThreshold, root + "/ckpt", AnnIndex.VerdictOnly)
    try {
      pool.filter(col("vec_id") % 4 === 1).coalesce(1)
        .write.mode("append").parquet(feed)
      q.processAllAvailable()
      pool.filter(col("vec_id") % 4 === 3).coalesce(1)
        .write.mode("append").parquet(feed)
      q.processAllAvailable()
    } finally q.stop()
    val streamRows = spark.read.parquet(root + "/verdicts/batch-0")
      .withColumn("batch", lit("b1"))
      .unionByName(spark.read.parquet(root + "/verdicts/batch-1")
        .withColumn("batch", lit("b2")))
      .select(col("vec_id"), col("batch"), col("keep"))
      .orderBy(col("vec_id")).collect().toSeq
    assert(streamRows == batchRows,
      "the verdict-only stream must not change a single keep/drop")
    // the verdict-only schema really is the slim one (no census stats)
    assert(spark.read.parquet(root + "/verdicts/batch-0")
      .schema.fieldNames.toSeq == Seq("vec_id", "keep"))
  }
}

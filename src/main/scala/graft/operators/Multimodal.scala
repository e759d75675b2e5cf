package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as a partition-mapped typed stage.
  *
  * The decode itself is a STUB (no image/audio libs in this
  * container): [[decodeStub]] derives deterministic fake dimensions
  * from the content hash. Everything around it — schema, binary
  * column, partition batching, typed `mapPartitions` signature — is
  * the real Spark plumbing a production decoder (JNI/FFMPEG/etc.)
  * would plug into one partition-iterator at a time.
  *
  * Scale note: `mapPartitions` keeps per-partition decoder state
  * (model handles, codec contexts) initialized once per task rather
  * than per row; binary payloads stay columnar until the decode
  * boundary.
  */
object Multimodal {

  /** One asset: id + mime + raw bytes (A8-analog of the reference's
    * binary upload surface, pages/2_Creative_Uploader.py:74-140).
    */
  case class AssetRow(doc_id: Long, mime: String, content: Array[Byte])

  /** Extracted features (deterministic given content). */
  case class AssetFeatures(doc_id: Long, mime: String, byte_len: Long,
      content_hash: String, fake_width: Long, fake_height: Long)

  def md5hex(b: Array[Byte]): String = graft.Hashing.md5hex(b)

  /** Stubbed decoder: one hash pass per asset; "dimensions" are a
    * deterministic function of the hash so the oracle can recompute
    * them (`('0x'||substr(md5, ...)) % k + 1` in DuckDB).
    */
  def decodeStub(rows: Iterator[AssetRow]): Iterator[AssetFeatures] =
    rows.map { r =>
      val h = md5hex(r.content)
      AssetFeatures(r.doc_id, r.mime, r.content.length.toLong, h,
        java.lang.Long.parseLong(h.substring(0, 4), 16) % 640 + 1,
        java.lang.Long.parseLong(h.substring(4, 8), 16) % 480 + 1)
    }

  /** One sampled frame of a "video" asset (stub decode). */
  case class FrameSample(doc_id: Long, frame_idx: Long, ts_ms: Long,
      frame_hash: String)

  /** Aspect-fit resize result (stub transform). */
  case class ResizedAsset(doc_id: Long, fake_width: Long, fake_height: Long,
      out_w: Long, out_h: Long, thumb_hash: String)

  /** Frame-sampling stub: the payload is treated as a fixed-rate
    * "video" whose frame count derives deterministically from its
    * size (1 frame per 40 bytes + 1, i.e. 25 fps of 1-byte-per-ms
    * footage), and a uniform stride keeps at most `maxFrames` frames
    * per asset — the standard bounded-fan-out contract of a training
    * frame sampler: the 1-to-N explosion is capped per asset, so
    * stage output volume is ≤ maxFrames × assets regardless of clip
    * length. Each sampled frame carries its index, timestamp, and a
    * deterministic content-derived hash (a real decoder would emit
    * pixel tensors here). Iterator-to-iterator, so a production codec
    * context initializes once per PARTITION, not per asset.
    */
  def frameSampleStub(maxFrames: Int)(
      rows: Iterator[AssetRow]): Iterator[FrameSample] =
    rows.flatMap { r =>
      val h = md5hex(r.content)
      val nFrames = r.content.length.toLong / 40L + 1L
      val stride = (nFrames + maxFrames - 1) / maxFrames
      (0L until nFrames by stride).iterator.map { i =>
        FrameSample(r.doc_id, i, i * 40L,
          md5hex(s"$h:$i".getBytes("UTF-8")))
      }
    }

  /** Aspect-fit resize stub: fit (fake_width, fake_height) into a
    * `box`×`box` square preserving aspect ratio, all in integer
    * arithmetic (floor division, floor ≥ 1) so the oracle recomputes
    * it exactly; the "resized payload" is a deterministic hash of
    * (content hash, output geometry). Row-local — a real resize is
    * too, so the stage stays narrow (no shuffle) at any scale.
    */
  def resizeStub(box: Long)(
      rows: Iterator[AssetFeatures]): Iterator[ResizedAsset] =
    rows.map { f =>
      val m = math.max(f.fake_width, f.fake_height)
      val ow = math.max(1L, f.fake_width * box / m)
      val oh = math.max(1L, f.fake_height * box / m)
      ResizedAsset(f.doc_id, f.fake_width, f.fake_height, ow, oh,
        md5hex(s"${f.content_hash}:${ow}x$oh".getBytes("UTF-8")))
    }

  /** Doc-level audio features (stub decode): sample/duration/resample
    * geometry plus windowed silence counts.
    */
  case class AudioFeatures(doc_id: Long, n_samples: Long, duration_ms: Long,
      n_rs: Long, rs_hash: String, n_windows: Long, n_silent: Long)

  /** Audio stub: the payload is treated as 8-bit PCM at 8 kHz (one
    * byte = one sample). Three operations a speech-data pipeline runs
    * per clip, all integer-exact so the oracle replays them:
    *
    *  - **duration**: n_samples · 1000 / 8000 (floor);
    *  - **resample** 8 kHz → 2 kHz: keep every 4th sample —
    *    n_rs = ceil(n/4); the resampled payload is represented by a
    *    deterministic hash of (content hash, n_rs), where a real
    *    resampler would emit the sample array;
    *  - **silence windows**: 100-sample (12.5 ms) windows; each
    *    window's stub RMS level is the first 4 hex digits of
    *    md5(hash:w{idx}) mod 100, and a window is silent below 10 —
    *    the VAD-shaped per-window classify that segmenting/filtering
    *    speech corpora needs, rolled up per clip.
    *
    * The window sweep is a per-row loop over ceil(n/100) windows —
    * output stays ONE row per clip (the rollup), so stage output is
    * sized by input rows; only CPU grows with clip length, exactly
    * like a real VAD pass. Iterator-to-iterator: decoder/VAD state
    * initializes once per partition.
    */
  def audioFeatureStub(rows: Iterator[AssetRow]): Iterator[AudioFeatures] =
    rows.map { r =>
      val h = md5hex(r.content)
      val n = r.content.length.toLong
      val nRs = (n + 3L) / 4L
      val nWin = (n + 99L) / 100L
      val nSilent = (0L until nWin).count { w =>
        java.lang.Long.parseLong(
          md5hex(s"$h:w$w".getBytes("UTF-8")).substring(0, 4), 16) % 100 < 10
      }.toLong
      AudioFeatures(r.doc_id, n, n * 1000L / 8000L, nRs,
        md5hex(s"$h:rs:$nRs".getBytes("UTF-8")), nWin, nSilent)
    }

  /** documents(text) -> asset table with a binary payload column. */
  def assetsFromDocuments(docs: DataFrame): Dataset[AssetRow] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), lit("text/plain").as("mime"),
      col("text").cast(BinaryType).as("content")).as[AssetRow]
  }

  /** Full decode stage: binary assets -> features, partition-mapped. */
  def extractFeatures(docs: DataFrame): Dataset[AssetFeatures] = {
    val s = docs.sparkSession
    import s.implicits._
    assetsFromDocuments(docs).mapPartitions(decodeStub)
  }

  /** A8: materialize a real on-disk asset fixture from the documents
    * table — one file per doc, extensions alternating by doc_id parity
    * so the mime mapping below is exercised. Written DRIVER-side
    * through the configured Hadoop `FileSystem`: the fixture must land
    * where the subsequent `binaryFile` LISTING will look, which on any
    * non-local master is the shared FS — an executor-side
    * `java.io.File` write would scatter files across worker-local
    * disks the driver never sees. The collect is `maxDocs`-capped
    * (scheduler-sized): this is the upload-surface analog
    * (pages/2_Creative_Uploader.py:74-140), not a lake layout — a real
    * asset lake keeps payloads in parquet row groups or an object
    * store, never millions of tiny files.
    */
  def writeAssetFiles(docs: DataFrame, dir: String, maxDocs: Long = 200): Unit = {
    val base = new Path(dir)
    val f = base.getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
    f.mkdirs(base)
    docs.filter(col("doc_id") <= maxDocs)
      .select(col("doc_id").cast(LongType), col("text"))
      .collect()
      .foreach { r =>
        val id = r.getLong(0)
        val ext = if (id % 2 == 0) "bin" else "txt"
        // Write-then-rename so each asset appears ATOMICALLY: a
        // concurrent binaryFile readStream (x69) lists the directory
        // between triggers, and a file observed mid-write would be
        // decoded truncated ONCE and then pinned by seen-path
        // tracking, never re-read. The dot prefix keeps the temp name
        // invisible to Hadoop listings (hiddenFileFilter) until the
        // rename flips it in complete.
        val dest = new Path(base, s"asset-$id.$ext")
        val tmp = new Path(base, s".asset-$id.$ext.tmp")
        val out = f.create(tmp, true)
        try out.write(r.getString(1).getBytes("UTF-8")) finally out.close()
        f.delete(dest, false)
        require(f.rename(tmp, dest), s"asset fixture rename failed: $dest")
      }
  }

  /** A8: the REAL binary ingestion path — `spark.read.format
    * ("binaryFile")` over an asset directory gives (path,
    * modificationTime, length, content); doc id and mime derive from
    * the file name. At scale the source parallelizes by file and
    * `maxBytesPerPartition` bounds task input; pushing a
    * `pathGlobFilter` restricts the listing without reading payloads.
    */
  def assetsFromBinaryFiles(s: org.apache.spark.sql.SparkSession,
      dir: String): Dataset[AssetRow] = assetRows(s.read.format("binaryFile").load(dir))

  /** The ONE path-to-(doc_id, mime, content) mapping — shared by the
    * batch and streaming readers so the two decode contracts (and the
    * oracle both hash against) cannot drift.
    */
  private def assetRows(listing: DataFrame): Dataset[AssetRow] = {
    val s = listing.sparkSession
    import s.implicits._
    listing.select(
        regexp_extract(col("path"), "asset-([0-9]+)\\.", 1)
          .cast(LongType).as("doc_id"),
        when(col("path").endsWith(".bin"), lit("application/octet-stream"))
          .otherwise(lit("text/plain")).as("mime"),
        col("content"))
      .as[AssetRow]
  }

  /** Decode stage over the binaryFile source. */
  def extractFeaturesFromFiles(s: org.apache.spark.sql.SparkSession,
      dir: String): Dataset[AssetFeatures] = {
    import s.implicits._
    assetsFromBinaryFiles(s, dir).mapPartitions(decodeStub)
  }

  /** STREAMING leg of the asset surface: the same `binaryFile` listing
    * as [[assetsFromBinaryFiles]], as an unbounded `readStream` — new
    * asset files arriving in the directory decode incrementally
    * through the SAME per-partition stub the batch path uses (the
    * decode is stateless, so batch and stream share the operator by
    * construction). `maxFilesPerTrigger` is the rate-control analog of
    * the reference's page pacing (main_extractor.py pause loop); the
    * file source's seen-path tracking gives exactly-once per asset.
    * File streams require an explicit schema — binaryFile's is fixed.
    */
  def streamAssetFeatures(s: org.apache.spark.sql.SparkSession, dir: String,
      maxFilesPerTrigger: Int): Dataset[AssetFeatures] = {
    import s.implicits._
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    assetRows(s.readStream.format("binaryFile").schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .load(dir))
      .mapPartitions(decodeStub)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** x80-vs-x79 premium attribution (VERDICT r15 #4): the bench rows
  * compare UNLIKE work — x79's reps probe PREBUILT, JVM-cached index
  * states (`pristineAnnIndexFor`/`postB1AnnIndexFor` amortize the
  * appends across reps), while each x80 rep pays the FULL lifecycle:
  * index copy, per-batch verdict parquet round-trip, kept-vector
  * appends, checkpoint + ledger. The r15 note attributed the residual
  * 1.80× to "4 micro-batches vs 2", which is wrong on its face — x80
  * delivers exactly TWO one-file micro-batches (`arrive` renames one
  * coalesced part per batch, maxFilesPerTrigger=1), matching x79's
  * two probes, and the b2-probes-post-b1 contract makes merging them
  * semantics-changing, so there is no "matched batch count" knob to
  * turn.
  *
  * This diag measures the LIKE-for-LIKE premium: a batch twin that
  * runs the identical full lifecycle (fresh index copy → per batch:
  * census probe, verdict parquet write, kept append) against
  * `dedupStream` on its own fresh copy of the same history index.
  * Whatever gap remains is the true streaming machinery cost (file
  * source listing, checkpoint commits, ledger markers, the
  * foreachBatch persist) — and the stream SAVES one full ranking
  * pass per batch (its append routes off the materialized rank 1,
  * VERDICT r14 #5, where the batch twin's `append()` re-runs the
  * assignment argmax).
  *
  * Run: `runMain graft.SemStreamDiag <sfDir> [<sfDir>...]` — one JSON
  * line per dir: seconds for the batch-lifecycle twin and the
  * streamed lifecycle (min of 2 timed runs after a warm-up), plus
  * the verdict-set equality check between the two.
  */
object SemStreamDiag {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SemStreamDiag <sfDir> [<sfDir>...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Logs.quietNoise()
    args.toSeq.foreach(dir => one(spark, dir))
    spark.stop()
  }

  private def fs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def copyDir(spark: SparkSession, from: String, to: String): Unit = {
    val f = fs(spark, from)
    org.apache.hadoop.fs.FileUtil.copy(f,
      new org.apache.hadoop.fs.Path(from), f,
      new org.apache.hadoop.fs.Path(to), false, true,
      spark.sparkContext.hadoopConfiguration)
    ()
  }

  private def one(spark: SparkSession, dir: String): Unit = {
    val ann = graft.operators.AnnIndex
    val tau = graft.queries.Extras.EmbedCosThreshold
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val cents = e.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val pool = e.filter(col("vec_id") >= 17)
    val hist = pool.filter(col("vec_id") % 2 === 0)
    val b1 = pool.filter(col("vec_id") % 4 === 1)
    val b2 = pool.filter(col("vec_id") % 4 === 3)
    val root0 = java.nio.file.Files
      .createTempDirectory("graft-semstream").toString
    val histIdx = s"$root0/hist"
    ann.build(hist, cents, histIdx)
    var run = 0

    // the full batch lifecycle, same work items as the stream's two
    // micro-batches: census probe → verdict parquet write → kept
    // append (append() re-ranks the kept rows — the pass dedupStream
    // saves by routing off the materialized rank 1)
    def batchTwin(): Set[(Long, Boolean)] = {
      run += 1
      val root = s"$root0/batch$run"
      val idx = s"$root/index"
      copyDir(spark, histIdx, idx)
      Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
        val out = s"$root/verdicts/batch-$i"
        ann.dedupAgainst(spark, idx, b, cents, nprobe = 2, tau)
          .write.mode("overwrite").parquet(out)
        val kept = b.join(spark.read.parquet(out).filter(col("keep"))
          .select(col("vec_id")), Seq("vec_id"), "left_semi")
        ann.append(kept, cents, idx)
      }
      spark.read.parquet(s"$root/verdicts/batch-0", s"$root/verdicts/batch-1")
        .select(col("vec_id"), col("keep"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    }

    // x80's streamed lifecycle on its own fresh copy. `files` = how
    // many part files each batch arrives as (x80 uses 1): with
    // maxFilesPerTrigger = files and all of a batch's parts renamed in
    // before processAllAvailable, the micro-batch CONTENT (and so the
    // b2-probes-post-b1 contract) is identical — only the file
    // source's input parallelism changes, isolating the
    // one-file-one-partition effect from genuine streaming machinery.
    def streamTwin(files: Int): Set[(Long, Boolean)] = {
      run += 1
      val root = s"$root0/stream$run"
      val idx = s"$root/index"
      copyDir(spark, histIdx, idx)
      val feedP = new org.apache.hadoop.fs.Path(s"$root/feed")
      val ffs = fs(spark, root)
      ffs.mkdirs(feedP)
      def arrive(batch: DataFrame, name: String): Unit = {
        val stage = new org.apache.hadoop.fs.Path(s"$root/stage_$name")
        batch.repartition(files).write.mode("overwrite")
          .parquet(stage.toString)
        val parts = ffs.listStatus(stage).map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
        require(parts.nonEmpty, s"no part staged for $name")
        parts.zipWithIndex.foreach { case (part, i) =>
          if (!ffs.rename(part, new org.apache.hadoop.fs.Path(feedP,
            s"$name-$i.parquet"))) sys.error(s"rename failed for $name")
        }
      }
      val stream = spark.readStream.schema(pool.schema)
        .option("maxFilesPerTrigger", files).parquet(feedP.toString)
      val q = ann.dedupStream(stream, idx, s"$root/verdicts", cents,
        nprobe = 2, tau, s"$root/ckpt")
      try {
        arrive(b1, "b1"); q.processAllAvailable()
        arrive(b2, "b2"); q.processAllAvailable()
      } finally q.stop()
      spark.read.parquet(s"$root/verdicts/batch-0", s"$root/verdicts/batch-1")
        .select(col("vec_id"), col("keep"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    }

    // SPARK_GRAFT_SEMSTREAM_RUNS=0 → warm-up only (equality check
    // without the timed reps); SPARK_GRAFT_SEMSTREAM_WIDE=0 skips the
    // wide-arrival variant
    val reps = sys.env.getOrElse("SPARK_GRAFT_SEMSTREAM_RUNS", "2").toInt
    def timed(f: () => Set[(Long, Boolean)]): (Double, Set[(Long, Boolean)]) = {
      val v = f() // warm-up (codegen + page cache), untimed
      val secs = if (reps < 1) Double.NaN else (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min
      (secs, v)
    }
    def num(d: Double) = if (d.isNaN) "null" else d.toString
    val (bSecs, bV) = timed(() => batchTwin())
    val (sSecs, sV) = timed(() => streamTwin(1))
    val cpus = spark.sparkContext.defaultParallelism
    // the wide variant is TIMING ATTRIBUTION ONLY: its per-part
    // renames are not atomic as a group, so the stream's listing can
    // legitimately split a logical batch across triggers — on a
    // dup-heavy corpus the split halves then dedup against each other
    // (correct per the index-only contract, different from the
    // two-batch replay), so its verdicts are reported separately and
    // NOT part of the stream≡batch equality claim
    val wide = sys.env.getOrElse("SPARK_GRAFT_SEMSTREAM_WIDE", "1") == "1"
    val (swSecs, swV) =
      if (wide) timed(() => streamTwin(cpus)) else (Double.NaN, sV)
    println(s"""{"diag":"semstream","dir":"$dir",""" +
      s""""n_hist":${hist.count()},"micro_batches":2,"batch_probes":2,""" +
      s""""batch_lifecycle_secs":${num(bSecs)},""" +
      s""""stream_lifecycle_secs":${num(sSecs)},""" +
      s""""stream_wide_arrival_secs":${num(swSecs)},"wide_files":$cpus,""" +
      s""""premium":${num(math.rint(sSecs / bSecs * 100) / 100)},""" +
      s""""premium_wide":${num(math.rint(swSecs / bSecs * 100) / 100)},""" +
      s""""verdicts_equal_stream":${bV == sV},""" +
      s""""verdicts_equal_wide":${sV == swV}}""")
    spark.catalog.clearCache()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is forced through the `noop` sink (full execution of
  * every operator and column) rather than `.count()`, which would let
  * Catalyst prune the projection and measure a metadata scan
  * (VERDICT r01 "What's wrong").
  *
  * Reproducibility (VERDICT r03 "What's wrong" #1/#4): each query runs
  * `SPARK_GRAFT_BENCH_RUNS` times (default 3, clamped to >= 1) and
  * reports the MEDIAN of the SUCCESSFUL runs (even-sized samples
  * average the two middle values); `spark.catalog.clearCache()` runs
  * after every execution so a query's persisted intermediates
  * (x02/x04 token indexes) never squat in the heap across queries or
  * repetitions — every timed run pays its own full cost from parquet.
  *
  * Failure visibility (ADVICE r04): a run whose query throws is NOT
  * folded into the median — its time is discarded, `failed_runs`
  * counts it in the artifact, and a query with zero successful runs
  * reports `null` (excluded from the total) so a crash can never
  * deflate the numbers silently.
  *
  * The JSON line goes to stdout AND, when `BENCH_OUT` is set, to that
  * file verbatim — so the artifact doesn't depend on scraping the sbt
  * log (VERDICT r04 #8). It is also always written to
  * `BENCH_LAST.json` in the working directory so every run leaves a
  * machine-readable artifact even when the env var is absent, and
  * appended (commit- and time-stamped) to `BENCH_HISTORY.jsonl`,
  * the committed append-only record that keeps every run's full
  * per-query maps diagnosable after BENCH_LAST is overwritten and
  * the driver's 2000-char log tail truncates them (VERDICT r10 #6).
  *
  * Contention evidence (BENCH_r05 post-mortem): the shared VM can be
  * loaded by other tenants mid-run — r5's driver bench reported 213 s
  * where the identical commit measures 58 s on an idle box, with
  * uniform ~1x q-queries and 3-22x inflation concentrated in whichever
  * queries ran during the load spike. Two fields make that failure
  * mode self-evident in the artifact: `queries_min` / `total_min`
  * (the minimum of the runs — a far better estimator of inherent plan
  * cost under transient external load, since a query's floor cannot be
  * faked by noise) and `loadavg_start`/`loadavg_end` (the 1-minute
  * /proc/loadavg, which on a quiet 32-cpu box stays near the bench's
  * own parallelism). A median >> min spread plus an elevated loadavg
  * reads as "machine was busy", not "plan got slower".
  *
  * Variance bounds (VERDICT r08 #2 — r8's 19% "regression" was
  * indistinguishable from host noise): each query now runs one
  * UNTIMED warm-up rep before its timed runs (absorbing the per-plan
  * codegen compile + page-cache fill that r8 charged to whichever rep
  * came first), the artifact carries `queries_spread` (per-query
  * mean/min over the timed runs), `queries_load` (1-min loadavg
  * sampled at each query's start), `max_spread`, and `noisy_queries`
  * (spread > 1.5 — the threshold above which a number should not be
  * trusted as a plan cost). A noisy query warns on stderr; set
  * `SPARK_GRAFT_BENCH_STRICT=1` to turn that into a nonzero exit
  * (not the default: the per-round artifact must still land when the
  * shared host is busy — the spread fields mark it untrustworthy).
  */
object Bench {
  /** Median of a non-empty sample; even sizes average the middle two. */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.size
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** 1-minute load average from /proc/loadavg ("n/a" off Linux). */
  private def loadavg(): String =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").split(" ").head
    catch { case _: Throwable => "n/a" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    // Warm the JVM/codegen/IO paths once so the first measured query
    // doesn't absorb session bootstrap cost.
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    // Optional subset sweep (comma-separated keys): scale rehearsals
    // target one operator family (VERDICT r10 #4 runs the dedup/pair
    // family at factor 100) without paying the full 101-query sweep at
    // that volume. The driver's per-round run leaves this unset, so
    // the round artifact stays the full contract surface.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    // fail fast on typos: a silently-empty subset would still overwrite
    // BENCH_LAST.json and append a bogus total=0 line to the committed
    // append-only history
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in SparkEntry.queries: " +
          unknown.toSeq.sorted.mkString(", "))
    }
    val loadStart = loadavg()
    var failedRuns = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val qLoad = loadavg()
      // one untimed warm-up rep: absorbs the per-plan codegen compile
      // and page-cache fill so the timed runs measure steady-state plan
      // cost (the quantity comparable across rounds); its failure is
      // counted like any run's so a crash still surfaces
      val samples = (0 to runs).map { rep =>
        val t0 = System.nanoTime()
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
          }
        val t = (System.nanoTime() - t0) / 1e9
        // drop this query's persisted intermediates before the next run
        spark.catalog.clearCache()
        (t, ok, rep == 0)
      }
      val good = samples.collect { case (t, true, false) => t }
      failedRuns += samples.count(s => !s._2)
      (name, good, qLoad)
    }
    def obj(f: Seq[Double] => Double): String = results.map { case (k, good, _) =>
      "\"" + k + "\":" + (if (good.nonEmpty) f(good).toString else "null")
    }.mkString("{", ",", "}")
    def spreadOf(good: Seq[Double]): Double =
      if (good.isEmpty || good.min <= 0) 1.0
      else (good.sum / good.size) / good.min
    val medians = obj(median)
    val mins = obj(_.min)
    val spreads = obj(g => math.rint(spreadOf(g) * 100) / 100)
    val qLoads = results.map { case (k, _, l) => "\"" + k + "\":\"" + l + "\"" }
      .mkString("{", ",", "}")
    val maxSpread = results.map(r => spreadOf(r._2)).maxOption.getOrElse(1.0)
    val noisy = results.filter(r => spreadOf(r._2) > 1.5).map(_._1)
    noisy.foreach(n => System.err.println(
      s"[bench] $n spread > 1.5x (mean/min) — number untrustworthy under load"))
    val total = results.collect { case (_, g, _) if g.nonEmpty => median(g) }.sum
    val totalMin = results.collect { case (_, g, _) if g.nonEmpty => g.min }.sum
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val noisyJson = noisy.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$medians,"queries_min":$mins,"queries_spread":$spreads,"queries_load":$qLoads,"max_spread":${math.rint(maxSpread * 100) / 100},"noisy_queries":$noisyJson,"warmup":1,"total_min":$totalMin,"sf":"$sfDir","runs":$runs,"failed_runs":$failedRuns,"max_heap_mb":$heapMb,"loadavg_start":"$loadStart","loadavg_end":"${loadavg()}"}"""
    println(line)
    (sys.env.get("BENCH_OUT").toSeq :+ "BENCH_LAST.json").foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}")
      }
    }
    // Append-only history (VERDICT r10 #6): BENCH_LAST.json is
    // overwritten by every run and the driver's per-round tail
    // truncates the per-query maps, so regressions lost their history
    // once a new baseline landed. Every run now also appends its full
    // artifact — stamped with commit + wall time — to
    // BENCH_HISTORY.jsonl, which is committed and never rewritten.
    try {
      val commit =
        try scala.sys.process.Process(
          Seq("git", "rev-parse", "--short", "HEAD")).!!.trim
        catch { case _: Throwable => "unknown" }
      val stamped =
        s"""{"ts":"${java.time.Instant.now()}","commit":"$commit",""" +
          line.stripPrefix("{")
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_HISTORY.jsonl"),
        (stamped + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not append history: ${e.getMessage}")
    }
    if (sys.env.get("SPARK_GRAFT_BENCH_STRICT").contains("1") && noisy.nonEmpty) {
      spark.stop()
      sys.exit(2)
    }
    spark.stop()
  }
}

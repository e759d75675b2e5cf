package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MinhashSignatureStore, SwapCommit}

/** The layout-swap protocol's concurrency layers (ADVICE r13): the
  * per-root JVM lock, the reader grace window, race-tolerant
  * roll-forward primitives, and GC of publish/replace litter.
  */
class SwapCommitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def localFs =
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)

  private def tmpRoot(name: String): Path = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-swap-$name")
    new Path(p.toString)
  }

  private def write(f: org.apache.hadoop.fs.FileSystem, p: Path,
      body: String): Unit = {
    val out = f.create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  private def read(f: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("gcOrphans removes aborted staging, stale marker temps, and " +
      "stale replace trash — and nothing else") {
    val f = localFs
    val root = tmpRoot("gc")
    f.mkdirs(new Path(root, "_staged-dead"))
    write(f, new Path(root, "_commit.tmp-abc"), "orphan publish temp")
    f.mkdirs(new Path(root, s"${SwapCommit.TrashPrefix}bands-xyz"))
    f.mkdirs(new Path(root, "bands")) // live data must survive
    write(f, new Path(root, "_scheme"), "16,4")
    SwapCommit.gcOrphans(f, root, "_staged-", "_commit", None)
    val names = f.listStatus(root).map(_.getPath.getName).toSet
    assert(names === Set("bands", "_scheme"),
      s"only live entries survive the GC, got $names")
  }

  test("replace: absent source is an already-applied no-op; a normal " +
      "replace installs the staged tree and leaves no trash") {
    val f = localFs
    val root = tmpRoot("replace")
    val dst = new Path(root, "bands")
    write(f, new Path(dst, "live.parquet"), "old")
    // already-applied: src missing, live untouched
    SwapCommit.replace(f, new Path(root, "_staged-gone/bands"), dst)
    assert(read(f, new Path(dst, "live.parquet")) === "old")
    // normal replace
    val src = new Path(root, "_staged-x/bands")
    write(f, new Path(src, "new.parquet"), "new")
    SwapCommit.replace(f, src, dst)
    assert(f.exists(new Path(dst, "new.parquet")))
    assert(!f.exists(new Path(dst, "live.parquet")),
      "replace swaps the whole tree, not a merge")
    assert(!f.listStatus(root).exists(
      _.getPath.getName.startsWith(SwapCommit.TrashPrefix)),
      "a completed replace cleans up its trash")
  }

  test("two recoverers racing the same committed replace cannot lose " +
      "the staged data (layer-3 tolerance, raced for real)") {
    val f = localFs
    (1 to 20).foreach { i =>
      val root = tmpRoot(s"race$i")
      val dst = new Path(root, "bands")
      write(f, new Path(dst, "old.parquet"), "old")
      val src = new Path(root, "_staged/bands")
      write(f, new Path(src, "new.parquet"), "new")
      // two threads apply the SAME committed swap with no lock between
      // them (the cross-process recovery shape): both must return
      // without error and the new tree must be installed exactly once
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = (1 to 2).map(_ => new Thread(() =>
        try SwapCommit.replace(f, src, dst)
        catch { case t: Throwable => errs.add(t) }))
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(errs.isEmpty, s"round $i: racing replace threw ${errs.peek()}")
      assert(read(f, new Path(dst, "new.parquet")) === "new",
        s"round $i: staged tree must survive the race")
      assert(!f.exists(new Path(dst, "old.parquet")))
      // trash may linger only if a loser displaced-then-restored; any
      // leftover is GC-able litter, never live data
      SwapCommit.gcOrphans(f, root, "_staged", "_commit", None)
      assert(f.listStatus(root).map(_.getPath.getName).toSet === Set("bands"))
    }
  }

  test("two recoverers racing the same committed merge both succeed " +
      "and every staged file lands exactly once") {
    val f = localFs
    (1 to 20).foreach { i =>
      val root = tmpRoot(s"mrace$i")
      val dst = new Path(root, "docs")
      write(f, new Path(dst, "live.parquet"), "live")
      val src = new Path(root, "_staged/docs")
      (1 to 5).foreach(k => write(f, new Path(src, s"part-$k.parquet"), s"p$k"))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = (1 to 2).map(_ => new Thread(() =>
        try SwapCommit.mergeTree(f, src, dst)
        catch { case t: Throwable => errs.add(t) }))
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(errs.isEmpty, s"round $i: racing merge threw ${errs.peek()}")
      val names = f.listStatus(dst).map(_.getPath.getName).toSet
      assert(names === Set("live.parquet") ++ (1 to 5).map(k => s"part-$k.parquet"),
        s"round $i: merged exactly once, live files untouched")
    }
  }

  test("a crashed commit recovered by many concurrent entry points " +
      "applies exactly once (the per-root lock serializes recovery)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val perms = graft.queries.Extras.Perms
    val store = java.nio.file.Files
      .createTempDirectory("graft-swap-conc").toString
    new java.io.File(store).delete()
    MinhashSignatureStore.build(spark,
      Seq(1L -> "a0 a1 a2 a3 a4 a5 a6 a7").toDF("doc_id", "text"),
      store, 16, 4, perms)
    // crash AFTER the marker publish: the batch is committed but
    // unapplied — exactly what racing recoveries then fight over
    intercept[java.io.IOException] {
      MinhashSignatureStore.writeBatchImpl(spark,
        Seq(30L -> "w0 w1 w2 w3 w4 w5 w6 w7").toDF("doc_id", "text"),
        store, 16, 4, perms, failAt = 2)
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (1 to 8).map(_ => new Thread(() =>
      try MinhashSignatureStore.recover(spark, store)
      catch { case t: Throwable => errs.add(t) }))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"concurrent recovery threw ${errs.peek()}")
    assert(!new java.io.File(store, "_commit").exists)
    assert(spark.read.parquet(s"$store/docs").count() === 2,
      "the committed batch applied exactly once")
    val v = MinhashSignatureStore.dedupAgainst(spark,
        Seq(40L -> "w0 w1 w2 w3 w4 w5 w6 w7").toDF("doc_id", "text"),
        store, perms, 0.7)
      .filter(col("doc_id") === 40L).collect().head
    assert(!v.getBoolean(1), "the recovered batch is fully probe-visible")
  }

  test("a reader waits out a live writer's commit window instead of " +
      "rolling the marker forward itself") {
    import spark.implicits._
    val perms = graft.queries.Extras.Perms
    val store = java.nio.file.Files
      .createTempDirectory("graft-swap-grace").toString
    new java.io.File(store).delete()
    MinhashSignatureStore.build(spark,
      Seq(1L -> "a0 a1 a2 a3 a4 a5 a6 a7").toDF("doc_id", "text"),
      store, 16, 4, perms)
    val root = new Path(store)
    val f = localFs
    // a marker whose payload would CRASH any recoverer that applies it
    // (unknown mode) — a reader honoring the grace must never touch it
    SwapCommit.publish(f, root, "_commit", "bogus-mode should-not-run")
    // the "live writer in another process": clears its marker mid-grace
    val writer = new Thread(() => {
      Thread.sleep(150)
      f.delete(new Path(root, "_commit"), false)
    })
    writer.start()
    val v = MinhashSignatureStore.dedupAgainst(spark,
        Seq(9L -> "a0 a1 a2 a3 a4 a5 a6 a7").toDF("doc_id", "text"),
        store, perms, 0.7)
      .collect().head
    writer.join()
    assert(!v.getBoolean(1),
      "the probe proceeds normally once the writer finishes")
  }
}

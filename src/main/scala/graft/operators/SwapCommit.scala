package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** THE layout-swap commit protocol (VERDICT r12 #8: one protocol, not
  * three): stage everything under an underscore-prefixed directory
  * inside the table root (invisible to parquet readers), publish ONE
  * commit-marker file atomically (temp + rename), then mutate the
  * live tree. The marker's atomic publication is the commit point —
  * present means "a swap is (or was) in flight and MUST roll
  * forward"; absent means the live layout is consistent as-is, and
  * any staging directories are aborted pre-commit attempts.
  *
  * Division of labor among the repo's commit mechanisms, so a reader
  * knows which to reach for:
  *  - [[SnapshotLog]]: versioned TABLES — multi-table txns, time
  *    travel, readers pinned to snapshots via a log of file lists.
  *  - THIS protocol: index-shaped STORES read by plain
  *    `spark.read.parquet` (AnnIndex cell layouts, the minhash
  *    signature store), where the read path must stay a vanilla
  *    partitioned parquet scan (partition pruning / DPP depend on
  *    it) and the only atomicity need is "the next reader sees the
  *    whole mutation or none of it".
  *  - The parquet committer's `_temporary` staging: single-job,
  *    single-directory writes — both of the above build on it.
  *
  * Users: [[AnnIndex.optimize]] (cell-split swap) and
  * [[MinhashSignatureStore]] (atomic two-table append + scheme
  * rebuild). Each user supplies its own roll-forward (what "apply the
  * staged state" means for its layout); the roll-forward MUST be
  * idempotent — staged entries already applied by a crashed
  * predecessor are absent from staging and get skipped — because
  * every reader/writer entry point re-runs it until [[finish]]
  * removes the marker.
  *
  * Concurrency model (ADVICE r13 — a reader running roll-forward
  * recovery used to race a live writer's own roll-forward on the same
  * renames). Three layers, outermost first:
  *  1. [[withLock]] — a JVM-wide lock per table root. Every entry
  *     point (reader or writer) runs its recovery, and every writer
  *     its publish→roll-forward→finish window, under this lock, so
  *     within one application the race cannot happen at all. This is
  *     the supported deployment: the stores' FS mutations all run on
  *     the driver of the single-writer application.
  *  2. [[awaitPending]] — a reader that finds a pending marker first
  *     gives a grace window for a LIVE writer (necessarily in another
  *     process, layer 1 excludes local ones) to finish its own
  *     roll-forward; only a marker that outlives the grace — a
  *     crashed writer — is recovered by the reader.
  *  3. [[mergeTree]]/[[replace]] tolerate LOST races: a rename that
  *     fails because a racing peer already applied the same committed
  *     swap is success, and replace displaces the live tree into a
  *     caller-owned trash name instead of deleting it, so even the
  *     worst cross-process interleaving can restore what it moved —
  *     no sequence of racing recoveries can lose live data.
  */
private[graft] object SwapCommit {

  /** Trash-name prefix [[replace]] displaces live trees under (same
    * root, underscore-prefixed → invisible to parquet). Stale entries
    * — a recoverer that crashed between displace and delete — are
    * GC'd by [[gcOrphans]].
    */
  val TrashPrefix = "_swap-trash-"

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** JVM-wide mutual exclusion per table root (keyed by the root's
    * URI string — callers spell a store's root consistently within an
    * app). Writers hold it across publish→roll-forward→finish;
    * readers hold it across their recovery check, so in-process
    * reader/writer and reader/reader recovery races are impossible.
    */
  def withLock[T](root: Path)(body: => T): T =
    locks.computeIfAbsent(root.toUri.toString, _ => new Object)
      .synchronized(body)

  /** The staged payload a pending marker points at. */
  final case class Pending(payload: String, marker: Path)

  /** Read the commit marker if one is published. The payload is the
    * user's own string (e.g. the staging dir name, optionally tagged
    * with a mode word).
    */
  def pending(f: FileSystem, root: Path, markerName: String): Option[Pending] = {
    val marker = new Path(root, markerName)
    if (!f.exists(marker)) None
    else {
      val in = f.open(marker)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      Some(Pending(txt, marker))
    }
  }

  /** Reader-side recovery gate: if a marker is pending, poll up to
    * `graceMs` for it to clear — a live writer (in another process;
    * [[withLock]] already serializes local ones) finishes its own
    * roll-forward in bounded time, and the reader then proceeds
    * against the clean layout without touching the tree. A marker
    * that OUTLIVES the grace belongs to a crashed writer: returned to
    * the caller, who rolls it forward itself (tolerantly — layer 3).
    */
  def awaitPending(f: FileSystem, root: Path, markerName: String,
      graceMs: Long): Option[Pending] = {
    val deadline = System.nanoTime() + graceMs * 1000000L
    var p = pending(f, root, markerName)
    while (p.isDefined && System.nanoTime() < deadline) {
      Thread.sleep(50)
      p = pending(f, root, markerName)
    }
    p
  }

  /** Publish the commit marker ATOMICALLY: write a temp file, rename
    * into place. Before the rename the live tree is untouched and a
    * crash leaves only ignorable staging (plus the temp itself —
    * GC'd by [[gcOrphans]], ADVICE r13); after it every entry point
    * rolls the swap forward.
    */
  def publish(f: FileSystem, root: Path, markerName: String,
      payload: String): Unit = {
    val marker = new Path(root, markerName)
    val tmp = new Path(root,
      s"$markerName.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(payload.getBytes("UTF-8")) finally out.close()
    require(f.rename(tmp, marker), s"SwapCommit: marker publish failed at $marker")
  }

  /** Retire a completed swap: delete the marker FIRST (the layout is
    * fully applied, so the protocol must stop re-running), then the
    * staging leftovers.
    */
  def finish(f: FileSystem, root: Path, marker: Path, staging: Path): Unit = {
    f.delete(marker, false)
    f.delete(staging, true)
  }

  /** Delete aborted pre-commit litter: staging dirs under `root`
    * whose name starts with `stagingPrefix` and which no pending
    * marker references, stale `<markerName>.tmp-*` files (a publish
    * that crashed between create and rename — ADVICE r13), and stale
    * [[TrashPrefix]] dirs (a [[replace]] that crashed between
    * displace and delete). Call from WRITER entry points only, AFTER
    * recovery — the store contracts are single-writer, so with no
    * marker pending every such entry is a crashed predecessor's,
    * never a live peer's.
    */
  def gcOrphans(f: FileSystem, root: Path, stagingPrefix: String,
      markerName: String, referenced: Option[String]): Unit =
    if (f.exists(root)) {
      val stale = f.listStatus(root).filter { st =>
        val n = st.getPath.getName
        (n.startsWith(stagingPrefix) && !referenced.contains(n)) ||
          n.startsWith(s"$markerName.tmp-") ||
          n.startsWith(TrashPrefix)
      }
      stale.foreach(st => f.delete(st.getPath, true))
    }

  /** rename() that treats a vanished source as a FAILED rename instead
    * of an exception: several FileSystem implementations (the local FS
    * included) throw FileNotFoundException when a racing peer moved
    * the source first — for the tolerant roll-forwards that is a lost
    * race to classify, not an error to propagate.
    */
  private def tryRename(f: FileSystem, src: Path, dst: Path): Boolean =
    try f.rename(src, dst)
    catch { case _: java.io.FileNotFoundException => false }

  /** listStatus() that treats a vanished directory as empty — a racing
    * peer's [[finish]] may retire the staging tree mid-walk.
    */
  private def listSafe(f: FileSystem,
      dir: Path): Array[org.apache.hadoop.fs.FileStatus] =
    try f.listStatus(dir)
    catch { case _: java.io.FileNotFoundException => Array.empty }

  /** Move every data file of the staged tree into the live tree,
    * preserving partition subdirectories — the MERGE roll-forward
    * (append semantics: live files are never touched). Idempotent:
    * a file already moved by a crashed predecessor is absent from
    * staging and skipped. File names are job-UUID-unique (parquet
    * part naming), so a merge can never clobber a live file. A rename
    * lost to a racing recoverer applying the same committed swap
    * (source gone, destination present) is success (ADVICE r13);
    * any other failure is loud.
    */
  def mergeTree(f: FileSystem, src: Path, dst: Path): Unit =
    if (f.exists(src)) {
      f.mkdirs(dst)
      listSafe(f, src).foreach { st =>
        if (st.isDirectory) mergeTree(f, st.getPath, new Path(dst, st.getPath.getName))
        else if (st.getPath.getName.endsWith(".parquet")) {
          val to = new Path(dst, st.getPath.getName)
          if (!tryRename(f, st.getPath, to))
            require(!f.exists(st.getPath) && f.exists(to),
              s"SwapCommit: merge rename failed for $to")
        }
      }
    }

  /** Replace the live dir/file with the staged one — the REPLACE
    * roll-forward (rebuild semantics). Idempotent: staged source
    * already swapped in by a crashed predecessor is absent and
    * skipped.
    *
    * Never deletes live data (ADVICE r13): the old destination is
    * DISPLACED into a caller-owned [[TrashPrefix]] name (deleted only
    * after the new tree is installed), so a recoverer racing a peer
    * on the same committed swap cannot destroy the freshly-applied
    * tree. Interleavings, exhaustively — peers A and B both see
    * src present:
    *  - B loses the src→dst rename with dst present: A applied it;
    *    whatever B displaced first was the OLD tree — drop it.
    *  - B loses the rename with dst ABSENT: B displaced the tree A
    *    had JUST installed; B restores it from its own trash name
    *    (unshared, so the restore cannot itself race).
    */
  def replace(f: FileSystem, src: Path, dst: Path): Unit =
    if (f.exists(src)) {
      val trash = new Path(dst.getParent,
        s"$TrashPrefix${dst.getName}-${java.util.UUID.randomUUID()}")
      val displaced = f.exists(dst) && tryRename(f, dst, trash)
      if (tryRename(f, src, dst)) {
        if (displaced) f.delete(trash, true)
      } else {
        require(!f.exists(src),
          s"SwapCommit: replace rename failed for $dst")
        // a racing peer won the src→dst install
        if (displaced && !f.exists(dst)) {
          // ...and WE then displaced its freshly-installed tree before
          // failing our own rename: put it back (the trash name is
          // ours alone, so the restore cannot itself race)
          require(f.rename(trash, dst),
            s"SwapCommit: replace restore failed for $dst")
        } else {
          // dst may be TRANSIENTLY displaced by a third racer that is
          // mid-restore — wait for it to settle before declaring loss
          val deadline = System.nanoTime() + 2000000000L
          while (!f.exists(dst) && System.nanoTime() < deadline)
            Thread.sleep(20)
          require(f.exists(dst),
            s"SwapCommit: replace lost $dst with nothing to restore")
          if (displaced) f.delete(trash, true)
        }
      }
    }
}

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
  */
private[operators] object SwapCommit {

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

  /** Publish the commit marker ATOMICALLY: write a temp file, rename
    * into place. Before the rename the live tree is untouched and a
    * crash leaves only ignorable staging; after it every entry point
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

  /** Delete aborted pre-commit staging dirs: entries under `root`
    * whose name starts with `stagingPrefix` and which no pending
    * marker references. Call from WRITER entry points only — the
    * store contracts are single-writer, so an unreferenced staging
    * dir can only be a crashed predecessor's, never a live peer's.
    */
  def gcOrphans(f: FileSystem, root: Path, stagingPrefix: String,
      referenced: Option[String]): Unit =
    if (f.exists(root))
      f.listStatus(root)
        .filter(st => st.getPath.getName.startsWith(stagingPrefix) &&
          !referenced.contains(st.getPath.getName))
        .foreach(st => f.delete(st.getPath, true))

  /** Move every data file of the staged tree into the live tree,
    * preserving partition subdirectories — the MERGE roll-forward
    * (append semantics: live files are never touched). Idempotent:
    * a file already moved by a crashed predecessor is absent from
    * staging and skipped. File names are job-UUID-unique (parquet
    * part naming), so a merge can never clobber a live file; the
    * rename is required to succeed, making any violation loud.
    */
  def mergeTree(f: FileSystem, src: Path, dst: Path): Unit =
    if (f.exists(src)) {
      f.mkdirs(dst)
      f.listStatus(src).foreach { st =>
        if (st.isDirectory) mergeTree(f, st.getPath, new Path(dst, st.getPath.getName))
        else if (st.getPath.getName.endsWith(".parquet")) {
          val to = new Path(dst, st.getPath.getName)
          require(f.rename(st.getPath, to),
            s"SwapCommit: merge rename failed for $to")
        }
      }
    }

  /** Replace the live dir/file with the staged one — the REPLACE
    * roll-forward (rebuild semantics). Idempotent: staged source
    * already swapped in by a crashed predecessor is absent and
    * skipped. The delete-then-rename window is closed by the marker:
    * every entry point re-runs the roll-forward before reading.
    */
  def replace(f: FileSystem, src: Path, dst: Path): Unit =
    if (f.exists(src)) {
      f.delete(dst, true)
      require(f.rename(src, dst), s"SwapCommit: replace rename failed for $dst")
    }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Compaction, Deletes, SnapshotLog}

/** The snapshot commit log: atomic swaps, time travel, reader isolation
  * from concurrent maintenance, and the vacuum retention boundary.
  */
class SnapshotLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft-snap").toString + "/t"

  private def rows(part: String, ids: Seq[Int]) =
    ids.map(i => (i.toLong, part, s"v$i")).toDF("id", "part", "payload")

  test("overwrite + append commit monotonic versions and readAt time-travels") {
    val t = freshTable()
    val v1 = SnapshotLog.overwrite(rows("a", 1 to 10), t, Seq("part"))
    val v2 = SnapshotLog.append(rows("b", 11 to 15), t, Seq("part"))
    assert(v1 == 1 && v2 == 2)
    assert(SnapshotLog.readAt(spark, t, 1).count() == 10)
    assert(SnapshotLog.readAt(spark, t, 2).count() == 15)
    // partition column survives the explicit-file read
    assert(SnapshotLog.read(spark, t).filter($"part" === "b").count() == 5)
  }

  test("overwritePartitions swaps only touched partitions, atomically") {
    val t = freshTable()
    SnapshotLog.overwrite(rows("a", 1 to 5).union(rows("b", 6 to 10)), t, Seq("part"))
    SnapshotLog.overwritePartitions(rows("b", 100 to 101), t, Seq("part"))
    val latest = SnapshotLog.read(spark, t)
    assert(latest.filter($"part" === "a").count() == 5, "untouched partition intact")
    assert(latest.filter($"part" === "b").as[(Long, String, String)]
      .collect().map(_._1).sorted.toSeq == Seq(100L, 101L))
    // the pre-swap version still serves the old partition contents
    assert(SnapshotLog.readAt(spark, t, 1).filter($"part" === "b").count() == 5)
  }

  test("deleteByKeys (via Deletes delegation) purges latest, keeps history") {
    val t = freshTable()
    SnapshotLog.overwrite(rows("a", 1 to 5).union(rows("b", 6 to 10)), t, Seq("part"))
    val affected = Deletes.deleteByKeys(spark, t, "id",
      Seq(2L, 3L).toDF("id"), "part")
    assert(affected == Seq("a"), s"only partition a holds doomed keys: $affected")
    val latest = SnapshotLog.read(spark, t)
    assert(latest.count() == 8)
    assert(latest.filter($"id".isin(2L, 3L)).count() == 0)
    // right-to-be-forgotten clock: history serves them until vacuum
    assert(SnapshotLog.readAt(spark, t, 1).filter($"id".isin(2L, 3L)).count() == 2)
    SnapshotLog.vacuum(spark, t, retainLast = 1)
    assertThrows[IllegalArgumentException](SnapshotLog.readAt(spark, t, 1))
  }

  test("a reader planned before compaction still scans a consistent snapshot") {
    val t = freshTable()
    // many small files: one per append
    (1 to 6).foreach(i => if (i == 1) SnapshotLog.overwrite(rows("a", Seq(i)), t, Seq("part"))
      else SnapshotLog.append(rows("a", Seq(i)), t, Seq("part")))
    val before = SnapshotLog.latestVersion(spark, t).get
    val reader = SnapshotLog.readAt(spark, t, before) // planned pre-compaction
    val (v, compacted) = SnapshotLog.compact(spark, t, maxFiles = 1)
    assert(compacted.nonEmpty && v == before + 1)
    // the old files are unlinked from the log but NOT deleted — the
    // concurrent reader's explicit file list still resolves
    assert(reader.count() == 6)
    assert(SnapshotLog.read(spark, t).as[(Long, String, String)].collect().sorted.toSeq
      == reader.as[(Long, String, String)].collect().sorted.toSeq)
    // and the compacted partition really is one file now
    val snap = SnapshotLog.read(spark, t)
    assert(snap.inputFiles.length < reader.inputFiles.length)
  }

  test("Compaction.compact delegates to the log on snapshot tables") {
    val t = freshTable()
    (1 to 5).foreach(i => if (i == 1) SnapshotLog.overwrite(rows("a", Seq(i)), t, Seq("part"))
      else SnapshotLog.append(rows("a", Seq(i)), t, Seq("part")))
    val parts = Compaction.compact(spark, t, maxFiles = 1)
    assert(parts == Seq("part=a"))
    assert(SnapshotLog.latestVersion(spark, t).contains(6L))
    assert(SnapshotLog.read(spark, t).count() == 5)
  }

  test("concurrent appends race on the version slot and both land") {
    val t = freshTable()
    SnapshotLog.overwrite(rows("a", 1 to 2), t, Seq("part"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = Seq(
      Future(SnapshotLog.append(rows("b", 10 to 12), t, Seq("part"))),
      Future(SnapshotLog.append(rows("c", 20 to 24), t, Seq("part"))))
    val versions = Await.result(Future.sequence(fs), 120.seconds)
    assert(versions.toSet == Set(2L, 3L), s"distinct versions: $versions")
    assert(SnapshotLog.read(spark, t).count() == 10, "the rebase lost no files")
  }

  test("vacuum drops only unreferenced files and expired log entries") {
    val t = freshTable()
    SnapshotLog.overwrite(rows("a", 1 to 4), t, Seq("part"))
    SnapshotLog.overwritePartitions(rows("a", 5 to 6), t, Seq("part"))
    val dropped = SnapshotLog.vacuum(spark, t, retainLast = 1)
    assert(dropped.nonEmpty, "v1's unlinked files are vacuumable")
    assert(SnapshotLog.versions(spark, t) == Seq(2L))
    assert(SnapshotLog.read(spark, t).count() == 2, "latest untouched")
  }

  test("empty snapshot reads back with the committed schema") {
    val t = freshTable()
    SnapshotLog.overwrite(rows("a", 1 to 0), t, Seq("part"))
    val df = SnapshotLog.read(spark, t)
    assert(df.columns.toSeq.sorted == Seq("id", "part", "payload"))
    assert(df.count() == 0)
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Manifest

/** Schema-versioning manifest: record → history → drift round-trip. */
class ManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("record/history/drift across an evolving ingest") {
    val lake = Files.createTempDirectory("graft-manifest").toString

    val v1 = Seq(("c1", "100")).toDF("id", "daily_budget")
    Manifest.record(v1, lake, "campaign", rows = 1, atMillis = 1000L)

    val v2 = Seq(("c1", 100L, "ACTIVE")).toDF("id", "daily_budget", "status")
    Manifest.record(v2, lake, "campaign", rows = 3, atMillis = 2000L)

    // an unrelated entity must not pollute the history
    Manifest.record(v1, lake, "ad", rows = 9, atMillis = 1500L)

    val h = Manifest.history(v1, lake, "campaign")
    assert(h.map(_._1) == Seq(1000L, 2000L)) // oldest first
    assert(h.map(_._2) == Seq(1L, 3L))
    assert(h.head._3.fieldNames.toSeq == Seq("id", "daily_budget"))

    val d = Manifest.drift(h.head._3, h.last._3)
    assert(d == Seq(
      "added status: string",
      "retyped daily_budget: string -> bigint"))
    assert(Manifest.drift(h.last._3, h.last._3).isEmpty)
  }
}

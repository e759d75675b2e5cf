package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Compaction

/** Small-file compaction: plan flags fragmented partitions, compact
  * rewrites exactly those, data survives byte-identically.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("plan flags fragmented partitions; compact rewrites only them") {
    val lake = Files.createTempDirectory("graft-compact").toString
    val df = (1 to 400).map(i => (i.toLong, s"p$i", s"2024-01-0${i % 2 + 1}"))
      .toDF("id", "payload", "ingest_date")
    // day 1 fragmented into 8 files, day 2 written as a single file
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.filter($"ingest_date" === "2024-01-01").repartition(8)
      .write.mode("overwrite").partitionBy("ingest_date").parquet(lake)
    df.filter($"ingest_date" === "2024-01-02").repartition(1)
      .write.mode("overwrite").partitionBy("ingest_date").parquet(lake)

    val before = Compaction.plan(spark, lake, targetFileBytes = 1L << 20)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(before("ingest_date=2024-01-01")._1 == 8)
    assert(before("ingest_date=2024-01-01")._2 == "compact")
    assert(before("ingest_date=2024-01-02")._2 == "ok")

    val rewritten = Compaction.compact(spark, lake, targetFileBytes = 1L << 20)
    assert(rewritten == Seq("ingest_date=2024-01-01"))

    val after = Compaction.plan(spark, lake, targetFileBytes = 1L << 20)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(after("ingest_date=2024-01-01") == (1L, "ok"))
    // data round-trips exactly; the untouched partition kept its file
    val back = spark.read.parquet(lake)
      .select($"id", $"payload", $"ingest_date".cast("string"))
      .orderBy($"id").collect().toSeq
    assert(back == df.orderBy($"id").collect().toSeq)
    assert(after("ingest_date=2024-01-02")._1 == 1)
  }

  test("compact is a no-op on an already-healthy table") {
    val lake = Files.createTempDirectory("graft-compact-ok").toString
    Seq((1L, "2024-01-01")).toDF("id", "ingest_date")
      .write.mode("overwrite").partitionBy("ingest_date").parquet(lake)
    assert(Compaction.compact(spark, lake).isEmpty)
  }
}

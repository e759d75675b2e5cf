package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Deletes

/** Targeted delete-by-key: only affected partitions rewrite, untouched
  * partitions keep their exact files, fully-emptied partitions vanish.
  */
class DeletesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def files(dir: String): Set[String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Set.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
  }

  private def freshTable(): String = {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft-del").toString
    Seq((1L, "d1", "a"), (2L, "d1", "b"), (3L, "d2", "c"),
        (4L, "d2", "d"), (5L, "d3", "e"))
      .toDF("id", "day", "payload")
      .write.mode("overwrite").partitionBy("day").parquet(p)
    p
  }

  test("deletes the keys, rewrites only their partitions, others untouched") {
    import spark.implicits._
    val p = freshTable()
    val d2Before = files(s"$p/day=d2")
    val rewritten = Deletes.deleteByKeys(spark, p, "id",
      Seq(1L).toDF("id"), "day")
    assert(rewritten.map(String.valueOf(_)).toSet == Set("d1"))
    val left = spark.read.parquet(p).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(left == Set(2L, 3L, 4L, 5L))
    assert(files(s"$p/day=d2") == d2Before,
      "an unaffected partition's files must be byte-identical (same names)")
  }

  test("a fully-emptied partition's directory is removed") {
    import spark.implicits._
    val p = freshTable()
    val rewritten = Deletes.deleteByKeys(spark, p, "id",
      Seq(5L).toDF("id"), "day") // day=d3 holds only id 5
    assert(rewritten.map(String.valueOf(_)).toSet == Set("d3"))
    assert(!new java.io.File(s"$p/day=d3").exists(),
      "dynamic overwrite cannot clear an emptied partition; rm must")
    assert(spark.read.parquet(p).count() == 4)
  }

  test("absent keys write nothing at all") {
    import spark.implicits._
    val p = freshTable()
    val before = files(s"$p/day=d1") ++ files(s"$p/day=d2") ++ files(s"$p/day=d3")
    assert(Deletes.deleteByKeys(spark, p, "id", Seq(99L).toDF("id"), "day").isEmpty)
    val after = files(s"$p/day=d1") ++ files(s"$p/day=d2") ++ files(s"$p/day=d3")
    assert(after == before)
  }

  test("overwrite mode is restored after the scoped rewrite") {
    import spark.implicits._
    val key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    try {
      Deletes.deleteByKeys(spark, freshTable(), "id", Seq(1L).toDF("id"), "day")
      assert(spark.conf.get(key) == "static")
    } finally spark.conf.unset(key)
  }
}

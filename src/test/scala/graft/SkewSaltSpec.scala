package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewSalt

/** Salting must be a pure physical transformation: bit-identical
  * results to the unsalted plan on a deliberately skewed dataset
  * (99% of rows share one key).
  */
class SkewSaltSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val skewed = (1 to 2000).map { i =>
    val key = if (i % 100 == 0) s"k${i % 7}" else "hot"
    (i.toLong, key, i * 0.5)
  }.toDF("row_id", "k", "v")

  private lazy val dim = Seq(("hot", "H"), ("k0", "A"), ("k1", "B"),
    ("k3", "C")).toDF("k", "label")

  test("saltedJoin == plain inner join on a 99%-hot-key dataset") {
    val plain = skewed.join(dim, Seq("k"))
      .select("row_id", "k", "v", "label")
      .orderBy("row_id").collect().toSeq
    val salted = SkewSalt.saltedJoin(skewed, dim, "k", salts = 8,
        distinguisher = "row_id")
      .select("row_id", "k", "v", "label")
      .orderBy("row_id").collect().toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  /** Zipf-skewed events shard written to disk BY THE TEST (the driver's
    * synthetic lake is uniform — r6 verdict ask #7): key of rank r
    * appears ~N/r times, so the rank-1 key alone holds ~20% of rows.
    */
  private lazy val zipfPath = {
    val dir = java.nio.file.Files.createTempDirectory("graft-zipf").toString + "/events"
    val rows = (1 to 100).flatMap(r =>
      (1 to 12000 / r).map(i => (s"u$r", r * 1000000L + i, (i % 97).toDouble)))
    rows.toDF("user_id", "event_id", "value").write.parquet(dir)
    dir
  }

  test("zipf fixture: salting spreads the hot key; naive keying concentrates it") {
    val ev = spark.read.parquet(zipfPath)
    def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Long =
      df.select(spark_partition_id().as("p"))
        .groupBy("p").count().agg(max("count")).collect()(0).getLong(0)
    // plain hash partitioning on the key: every row of the hot key
    // lands on ONE reducer — the straggler a uniform-data test never sees
    val naiveMax = maxPartitionRows(ev.repartition(8, $"user_id"))
    // the salted shape (same transformation saltedJoin/saltedSumCount
    // apply): hot key spreads over the 8 salt buckets
    val saltedMax = maxPartitionRows(
      ev.withColumn("salt", pmod(hash($"event_id"), lit(8)))
        .repartition(8, $"user_id", $"salt"))
    assert(naiveMax >= 12000, s"rank-1 key must dominate one partition: $naiveMax")
    assert(saltedMax.toDouble <= naiveMax * 0.7,
      s"salting must break the straggler: salted=$saltedMax naive=$naiveMax")
  }

  test("AQE splits the skewed partition of a sort-merge join on the zipf fixture") {
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val ev = spark.read.parquet(zipfPath)
      val dim = (1 to 100).map(r => (s"u$r", s"label$r")).toDF("user_id", "label")
      val joined = ev.join(dim, Seq("user_id"))
      // collect THIS frame (count() would spawn a separate
      // QueryExecution and leave joined's adaptive plan unexecuted)
      assert(joined.collect().length == ev.count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must flag the hot key's partition as skewed:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedSumCount == plain groupBy aggregation") {
    def toMap(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val plain = toMap(skewed.groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("cnt"))
      .orderBy("k").collect().toSeq)
    val salted = toMap(SkewSalt.saltedSumCount(skewed, "k", "v", salts = 8,
        distinguisher = "row_id")
      .orderBy("k").collect().toSeq)
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (s, n)) =>
      assert(salted(k)._2 == n, s"count for $k")
      // double sums regroup additions — equal up to ulps, not bit-exact
      assert(math.abs(salted(k)._1 - s) <= math.ulp(s) * 8, s"sum for $k")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Bronze

/** Co-located join layout: two tables bucketed+sorted on the join key
  * must join with zero Exchange operators — the pre-shuffled lake
  * layout for recurring fact⋈fact joins (SCALE.md).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed orders and customer join without a shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("bucketed").toString
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    val customer = spark.read.parquet(s"${TestSpark.sf0001}/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    Bronze.writeBucketed(orders, "b_orders", s"$dir/orders", "o_custkey", 8)
    Bronze.writeBucketed(customer, "b_customer", s"$dir/customer", "o_custkey", 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), Seq("o_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // the join itself must consume the bucketed layout directly:
      // no Exchange below the join (the groupBy after it may shuffle)
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning(o_custkey"),
        s"join re-shuffled despite bucketing:\n$plan")
      assert(joined.collect().map(_.getLong(1)).sum == orders.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Events

/** Streaming-vs-batch equivalence for the library jobs (beyond Q28's
  * driver-checked tumbling case).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("streaming sessions == batch session_window") {
    val streamed = Events.drainToMemory(
        Events.sessions(Events.stream(spark, sf)))
      .select(col("user_id"), col("sw.start").as("s"), col("n_events"),
        col("sum_value").cast("double"))
      .orderBy("user_id", "s").collect().toSeq
    val batch = graft.queries.Inventory.q22(spark, sf)
      .select(col("user_id"), to_timestamp(col("session_start")).as("s"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "s").collect().toSeq
    assert(streamed == batch)
  }

  test("stateful dedupKeepLatest matches batch Q19 winners") {
    import spark.implicits._
    val events = Events.stream(spark, sf).as[Events.Event]
    val streamed = Events.drainToMemory(
        Events.dedupKeepLatest(events).toDF("user_id", "event_type", "latest"),
        OutputMode.Update())
    // Update-mode emits intermediate winners; keep the final row per key
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("latest.ts").desc, col("latest.event_id").desc)
    val finalRows = streamed
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("latest.event_id").as("event_id"))
      .orderBy("user_id", "event_type").collect().toSeq
    val batch = graft.queries.Inventory.q19(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"))
      .orderBy("user_id", "event_type").collect().toSeq
    assert(finalRows == batch)
  }
}

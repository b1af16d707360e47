package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

class EventStreamsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window counts over a stream (complete mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(ts("2024-01-01 00:10:00"), 1, "click", 1.0),
      Ev(ts("2024-01-01 00:40:00"), 1, "click", 2.0),
      Ev(ts("2024-01-01 01:10:00"), 2, "view", 3.0),
      Ev(ts("2024-01-01 01:20:00"), 2, "click", 4.0))
    val q = EventStreams.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .orderBy("window_start", "event_type")
        .select($"window_start".cast("string"), $"event_type", $"n", $"sum_value")
        .as[(String, String, Long, Double)].collect().toSeq
      assert(rows == Seq(
        ("2024-01-01 00:00:00", "click", 2L, 3.0),
        ("2024-01-01 01:00:00", "click", 1L, 4.0),
        ("2024-01-01 01:00:00", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("session windows merge events within the gap (complete mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      // user 1: two events 10 min apart (one session), then 40-min gap (new)
      Ev(ts("2024-01-01 00:00:00"), 1, "click", 1.0),
      Ev(ts("2024-01-01 00:10:00"), 1, "click", 2.0),
      Ev(ts("2024-01-01 00:50:00"), 1, "view", 4.0),
      // user 2: single event
      Ev(ts("2024-01-01 00:05:00"), 2, "view", 8.0))
    val q = EventStreams.sessionAggregates(mem.toDF())
      .writeStream.format("memory").queryName("session_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("session_test")
        .orderBy("user_id", "session_start")
        .select($"user_id", $"session_start".cast("string"), $"n_events", $"sum_value")
        .as[(Long, String, Long, Double)].collect().toSeq
      assert(rows == Seq(
        (1L, "2024-01-01 00:00:00", 2L, 3.0),
        (1L, "2024-01-01 00:50:00", 1L, 4.0),
        (2L, "2024-01-01 00:05:00", 1L, 8.0)))
    } finally q.stop()
  }

  test("watermark bounds state in append mode: late window emits after watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(mem.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("append_test")
      .outputMode("append").start()
    try {
      mem.addData(Ev(ts("2024-01-01 00:10:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // watermark still at 00:10 − 1h → nothing finalized
      assert(spark.table("append_test").count() == 0)
      // push event time far enough that the 00:00 window closes
      mem.addData(Ev(ts("2024-01-01 02:30:00"), 1, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 05:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val finalized = spark.table("append_test")
        .select($"window_start".cast("string"), $"event_type")
        .as[(String, String)].collect().toSet
      assert(finalized.contains(("2024-01-01 00:00:00", "click")))
    } finally q.stop()
  }
}

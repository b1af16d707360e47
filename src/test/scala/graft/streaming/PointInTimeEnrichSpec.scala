package graft.streaming

import graft.TestSpark
import graft.ops.{AsOfJoin, Behavior}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SCD-2 point-in-time enrichment
  * ([[EventStreams.enrichPointInTime]]) against the batch `scd2_lookup`
  * semantics (backward as-of join over the same dimension): every
  * purchase gets the version valid AT its timestamp — inclusive
  * valid_from, exclusive valid_to, null state before the key's first
  * version or for unknown keys, the open (is_current) version after the
  * last change. Batch and stream must agree row-for-row on a fixture
  * that hits each of those edges.
  */
class PointInTimeEnrichSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s"2026-01-01 $s")

  private val stateEvents = Seq(
    (1L, 10L, ts("00:00:10"), "browse"),
    (2L, 10L, ts("00:00:20"), "cart"),
    (3L, 10L, ts("00:00:30"), "browse"),
    (4L, 20L, ts("00:00:15"), "browse"))

  // (event_id, user_id, ts): before-first, inclusive-boundary, interior,
  // open-version, other-key-current, unknown-key
  private val purchases = Seq(
    (101L, 10L, ts("00:00:05")),
    (102L, 10L, ts("00:00:20")),
    (103L, 10L, ts("00:00:25")),
    (104L, 10L, ts("00:00:35")),
    (105L, 20L, ts("00:00:16")),
    (106L, 30L, ts("00:00:40")))

  private def dim = Behavior.scd2(
      stateEvents.toDF("event_id", "user_id", "ts", "event_type"),
      col("user_id"), col("ts"), col("event_id"), col("event_type"))
    .withColumnRenamed("k", "user_id")

  test("stream-static PIT join matches the batch as-of lookup on every edge") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = EventStreams.enrichPointInTime(
        mem.toDF().toDF("event_id", "user_id", "ts"), dim)
      .select("event_id", "version", "state")
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_pit_probe").start()
    val got = try {
      mem.addData(purchases: _*)
      q.processAllAvailable()
      spark.table("graft_pit_probe")
        .as[(Long, Option[Long], Option[String])].collect().toSet
    } finally q.stop()

    assert(got === Set(
      (101L, None, None),
      (102L, Some(2L), Some("cart")),
      (103L, Some(2L), Some("cart")),
      (104L, Some(3L), Some("browse")),
      (105L, Some(1L), Some("browse")),
      (106L, None, None)))

    // batch parity: the backward as-of join scd2_lookup ships
    val batch = AsOfJoin.backward(
        purchases.toDF("event_id", "user_id", "ts")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("purchase_us")),
        dim, key = "user_id", leftTime = "purchase_us",
        rightTime = "valid_from_us", rightPayload = Seq("version", "state"),
        rightTieBreak = "version")
      .select(col("event_id"), col("asof_version").as("version"),
        col("asof_state").as("state"))
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(batch === got)
  }
}

package graft.ops

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward: latest right row at-or-before each left row, per key") {
    val clicks = Seq(
      (101L, 1L, ts("2024-01-01 10:00:00")),   // after p1, before p2
      (102L, 1L, ts("2024-01-01 12:00:00")),   // exactly at p2 → inclusive
      (103L, 1L, ts("2024-01-01 08:00:00")),   // before any purchase
      (104L, 2L, ts("2024-01-01 10:00:00"))    // other key, no purchases
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (1L, ts("2024-01-01 09:00:00"), 11L, 5.0),
      (1L, ts("2024-01-01 12:00:00"), 12L, 7.0)
    ).toDF("user_id", "ts", "event_id", "value")

    val out = AsOfJoin.backward(clicks, purchases, "user_id", "ts", "ts",
        Seq("event_id", "value"), "event_id")
      .select("event_id", "asof_event_id", "asof_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap

    assert(out(101L) == (Some(11L), Some(5.0)))
    assert(out(102L) == (Some(12L), Some(7.0)))   // ties are inclusive
    assert(out(103L) == (None, None))             // nothing before
    assert(out(104L) == (None, None))             // key with no right rows
  }

  test("backward: right rows with null timestamps never match") {
    val left = Seq((1L, 9L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (9L, Option.empty[Timestamp], 1L, 1.0),
      (9L, Some(ts("2024-01-01 09:00:00")), 2L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.backward(left, right, "user_id", "ts", "ts",
        Seq("event_id", "value"), "event_id")
      .select("asof_event_id").as[Option[Long]].collect()
    assert(out.toSeq == Seq(Some(2L)))   // not the null-ts row
  }

  test("backward: timestamp tie among right rows resolved by tiebreak max") {
    val left = Seq((1L, 9L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (9L, ts("2024-01-01 09:00:00"), 1L, 1.0),
      (9L, ts("2024-01-01 09:00:00"), 2L, 2.0)    // same ts, higher id wins
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.backward(left, right, "user_id", "ts", "ts",
        Seq("event_id", "value"), "event_id")
      .select("asof_event_id", "asof_value").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((2L, 2.0)))
  }

  test("forward: earliest right row at-or-after each left row; ties take MIN tiebreak") {
    val clicks = Seq(
      (101L, 1L, ts("2024-01-01 10:00:00")),   // before p2 → p2
      (102L, 1L, ts("2024-01-01 12:00:00")),   // exactly at p2 → inclusive
      (103L, 1L, ts("2024-01-01 13:00:00")),   // after everything → none
      (104L, 2L, ts("2024-01-01 10:00:00"))    // other key, no purchases
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (1L, ts("2024-01-01 09:00:00"), 11L, 5.0),
      (1L, ts("2024-01-01 12:00:00"), 12L, 7.0),
      (1L, ts("2024-01-01 12:00:00"), 13L, 9.0)  // same ts: LOWER id wins
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.forward(clicks, purchases, "user_id", "ts", "ts",
        Seq("event_id", "value"), "event_id")
      .select("event_id", "asof_event_id", "asof_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(101L) == (Some(12L), Some(7.0)))
    assert(out(102L) == (Some(12L), Some(7.0)))
    assert(out(103L) == (None, None))
    assert(out(104L) == (None, None))
  }

  test("nearest: closer side wins, exact-distance ties choose backward") {
    val clicks = Seq(
      (101L, 1L, ts("2024-01-01 10:00:00")),   // 1h to p1, 2h to p2 → backward
      (102L, 1L, ts("2024-01-01 11:30:00")),   // 30m to p2, 2.5h to p1 → forward
      (103L, 1L, ts("2024-01-01 10:30:00")),   // 1.5h both ways → backward tie
      (104L, 2L, ts("2024-01-01 10:00:00"))    // no purchases at all
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (1L, ts("2024-01-01 09:00:00"), 11L, 5.0),
      (1L, ts("2024-01-01 12:00:00"), 12L, 7.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.nearest(clicks, purchases, "user_id", "ts", "ts",
        Seq("event_id", "value"), "event_id")
      .select("event_id", "asof_event_id", "asof_side")
      .as[(Long, Option[Long], Option[String])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(101L) == (Some(11L), Some("backward")))
    assert(out(102L) == (Some(12L), Some("forward")))
    assert(out(103L) == (Some(11L), Some("backward")))
    assert(out(104L) == (None, None))
  }

  test("nearest: one-sided availability falls through to the existing side") {
    val clicks = Seq(
      (101L, 1L, ts("2024-01-01 08:00:00")),   // before all → forward only
      (102L, 1L, ts("2024-01-01 23:00:00"))    // after all → backward only
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (1L, ts("2024-01-01 09:00:00"), 11L, 5.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.nearest(clicks, purchases, "user_id", "ts", "ts",
        Seq("event_id", "value"), "event_id")
      .select("event_id", "asof_event_id", "asof_side")
      .as[(Long, Option[Long], Option[String])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(101L) == (Some(11L), Some("forward")))
    assert(out(102L) == (Some(11L), Some("backward")))
  }

  test("tolerance: a match beyond the gap is discarded, inclusive at the bound") {
    val clicks = Seq(
      (101L, 1L, ts("2024-01-01 09:30:00")),   // 30m after p1 → within 1h
      (102L, 1L, ts("2024-01-01 10:00:00")),   // exactly 1h → inclusive
      (103L, 1L, ts("2024-01-01 11:00:01"))    // 2h1s → discarded
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (1L, ts("2024-01-01 09:00:00"), 11L, 5.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val hour = 3600L * 1000000L
    val b = AsOfJoin.backwardWithin(clicks, purchases, "user_id", "ts", "ts",
        Seq("event_id", "value"), "event_id", toleranceMicros = hour)
      .select("event_id", "asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(b(101L) === Some(11L))
    assert(b(102L) === Some(11L))
    assert(b(103L) === None)

    val f = AsOfJoin.forwardWithin(
        clicks.withColumn("ts", expr("ts - INTERVAL 3 HOURS")),
        purchases, "user_id", "ts", "ts",
        Seq("event_id", "value"), "event_id", toleranceMicros = hour)
      .select("event_id", "asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    // shifted 3h back: gaps become 2h30m / 2h / 59m59s ahead
    assert(f(101L) === None)
    assert(f(102L) === None)
    assert(f(103L) === Some(11L))
  }

  test("nearestWithin: per-direction gate — backward in tolerance, forward out") {
    // p1 at 09:00, p2 at 12:00; tolerance 1h
    val clicks = Seq(
      (101L, 1L, ts("2024-01-01 09:40:00")),  // b=40m in, f=2h20m out → backward
      (102L, 1L, ts("2024-01-01 11:20:00")),  // b=2h20m out, f=40m in → forward
      (103L, 1L, ts("2024-01-01 10:30:00")),  // both out (1.5h each) → nulls
      (104L, 1L, ts("2024-01-01 10:00:00")),  // exactly 1h backward → inclusive
      (105L, 2L, ts("2024-01-01 10:00:00"))   // no purchases at all
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (1L, ts("2024-01-01 09:00:00"), 11L, 5.0),
      (1L, ts("2024-01-01 12:00:00"), 12L, 7.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.nearestWithin(clicks, purchases, "user_id", "ts", "ts",
        Seq("event_id", "value"), "event_id",
        toleranceMicros = 3600L * 1000000L)
      .select("event_id", "asof_event_id", "asof_side")
      .as[(Long, Option[Long], Option[String])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(101L) == (Some(11L), Some("backward")))
    assert(out(102L) == (Some(12L), Some("forward")))
    assert(out(103L) == (None, None))
    assert(out(104L) == (Some(11L), Some("backward")))  // inclusive bound
    assert(out(105L) == (None, None))
  }

  test("nearestWithin: gate keeps the tie-to-backward rule on the survivors") {
    // equidistant (45m each way), both in tolerance → backward wins the tie
    val clicks = Seq((101L, 1L, ts("2024-01-01 09:45:00")))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (1L, ts("2024-01-01 09:00:00"), 11L, 5.0),
      (1L, ts("2024-01-01 10:30:00"), 12L, 7.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.nearestWithin(clicks, purchases, "user_id", "ts", "ts",
        Seq("event_id", "value"), "event_id",
        toleranceMicros = 3600L * 1000000L)
      .select("asof_event_id", "asof_side").as[(Long, String)].collect()
    assert(out.toSeq == Seq((11L, "backward")))
  }
}

package graft.streaming

import graft.TestSpark
import graft.streaming.StatefulOps.{UserEvent, UserProfile}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StatefulOpsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("fold accumulates counts, purchase tally, and last-seen") {
    val out = StatefulOps.fold(7L, Iterator(
      UserEvent(7L, "click", 1.0, 100L),
      UserEvent(7L, "purchase", 9.5, 300L),
      UserEvent(7L, "view", 0.5, 200L)), None)
    assert(out == UserProfile(7L, 3L, 1L, 11.0, 300L))
    // resumes from prior state
    val out2 = StatefulOps.fold(7L,
      Iterator(UserEvent(7L, "purchase", 1.0, 500L)), Some(out))
    assert(out2 == UserProfile(7L, 4L, 2L, 12.0, 500L))
  }

  test("flatMapGroupsWithState maintains per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = StatefulOps.userProfiles(mem.toDS())
      .writeStream.format("memory").queryName("profiles_test")
      .outputMode("update").start()
    try {
      mem.addData(
        UserEvent(1L, "click", 1.0, 100L),
        UserEvent(1L, "purchase", 5.0, 200L),
        UserEvent(2L, "view", 2.0, 150L))
      q.processAllAvailable()
      // second micro-batch builds on carried state for user 1
      mem.addData(UserEvent(1L, "purchase", 4.0, 400L))
      q.processAllAvailable()

      val latest = spark.table("profiles_test")
        .as[UserProfile].collect()
        .groupBy(_.user_id).map { case (u, ps) => u -> ps.maxBy(_.n_events) }
      assert(latest(1L) == UserProfile(1L, 3L, 2L, 10.0, 400L))
      assert(latest(2L) == UserProfile(2L, 1L, 0L, 2.0, 150L))
    } finally q.stop()
  }
}

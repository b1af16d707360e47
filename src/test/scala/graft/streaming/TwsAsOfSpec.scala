package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import graft.streaming.AsOfStream.{AsOfEvent, AsOfMatch}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Certifies the transformWithState as-of engine
  * ([[AsOfStream.nearestWithinTws]] family): decision parity with the
  * flatMapGroupsWithState engine on the SAME seeded random frame in all
  * three modes (both engines share the `resolve` fold, so a divergence
  * here would mean the state/timer plumbing disagrees — watermark
  * visibility, timer firing, or late-row filtering), plus the
  * engine-level late-data contract and a checkpoint stop/restart cycle
  * on restored TWS state.
  */
class TwsAsOfSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val Base = 1704067200L
  private val HorizonUs = 600L * 1000000L

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def ev(uid: Long, sec: Long, isLeft: Boolean, id: Long,
                 value: Double = 0.0): AsOfEvent =
    AsOfEvent(uid, isLeft, new Timestamp((Base + sec) * 1000),
      (Base + sec) * 1000000L, id, value)

  private def randomEvents(): Seq[AsOfEvent] = {
    val rnd = new scala.util.Random(42)
    (1L to 400L).map { id =>
      val uid = 1L + rnd.nextInt(25)
      val sec = rnd.nextInt(7200).toLong
      val isLeft = rnd.nextBoolean()
      ev(uid, sec, isLeft, id, value = rnd.nextInt(100).toDouble)
    }.sortBy(_.ts_micros)
  }

  private def runEngine(events: Seq[AsOfEvent], mode: AsOfStream.Mode,
                        tws: Boolean, name: String): Map[Long, AsOfMatch] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AsOfEvent]
    val ds = (mode, tws) match {
      case (AsOfStream.Nearest, false) =>
        AsOfStream.nearestWithin(mem.toDS(), HorizonUs, "5 seconds")
      case (AsOfStream.Forward, false) =>
        AsOfStream.forwardWithin(mem.toDS(), HorizonUs, "5 seconds")
      case (AsOfStream.Backward, false) =>
        AsOfStream.backwardWithin(mem.toDS(), HorizonUs, "5 seconds")
      case (AsOfStream.Nearest, true) =>
        AsOfStream.nearestWithinTws(mem.toDS(), HorizonUs, "5 seconds")
      case (AsOfStream.Forward, true) =>
        AsOfStream.forwardWithinTws(mem.toDS(), HorizonUs, "5 seconds")
      case (AsOfStream.Backward, true) =>
        AsOfStream.backwardWithinTws(mem.toDS(), HorizonUs, "5 seconds")
    }
    val q = ds.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      events.grouped(60).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      mem.addData(ev(999L, 7200 + 700, isLeft = false, 99999L))
      q.processAllAvailable()
      mem.addData(ev(999L, 7200 + 720, isLeft = false, 99998L))
      q.processAllAvailable()
      spark.table(name).as[AsOfMatch].collect()
        .filterNot(_.user_id == 999L)
        .map(m => m.event_id -> m).toMap
    } finally q.stop()
  }

  test("tws engine is decision-identical to fMGWS in all three modes") {
    val events = randomEvents()
    for (mode <- Seq(AsOfStream.Backward, AsOfStream.Forward,
        AsOfStream.Nearest)) {
      val tag = mode.toString.toLowerCase
      val want = runEngine(events, mode, tws = false, s"tws_asof_f_$tag")
      val got = withRocksDb {
        runEngine(events, mode, tws = true, s"tws_asof_t_$tag")
      }
      assert(got.keySet == want.keySet,
        s"$mode: left-row sets differ (${got.keySet.size} vs ${want.keySet.size})")
      want.foreach { case (id, w) =>
        assert(got(id) == w, s"$mode mismatch at left $id: ${got(id)} vs $w")
      }
      // fixture-exercise: matched and unmatched lefts both occur
      assert(want.values.exists(_.asof_event_id.isDefined) &&
        want.values.exists(_.asof_event_id.isEmpty), s"$mode one-sided")
    }
  }

  test("tws engine drops late rows: a late right never reopens a " +
    "resolved left, a late left emits nothing") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AsOfEvent]
    val q = AsOfStream.nearestWithinTws(mem.toDS(), HorizonUs, "5 seconds")
      .writeStream.format("memory").queryName("tws_asof_late")
      .outputMode("append").start()
    try {
      mem.addData(ev(1L, 1000, isLeft = true, 10L),
        ev(1L, 1100, isLeft = false, 20L, value = 7.0))
      q.processAllAvailable()
      mem.addData(ev(9L, 1700, isLeft = false, 90L))
      q.processAllAvailable()
      mem.addData(ev(9L, 1710, isLeft = false, 91L))
      q.processAllAvailable()
      def rows() = spark.table("tws_asof_late").as[AsOfMatch]
        .collect().filter(_.user_id == 1L).toSeq
      val first = rows()
      assert(first.map(m => (m.event_id, m.asof_event_id, m.asof_side)) ==
        Seq((10L, Some(20L), Some("forward"))))
      mem.addData(ev(1L, 1050, isLeft = false, 21L, value = 9.0))
      q.processAllAvailable()
      assert(rows() == first, "late right reopened a resolved left")
      mem.addData(ev(1L, 900, isLeft = true, 11L))
      q.processAllAvailable()
      assert(rows() == first,
        s"late left produced output: ${rows().filter(_.event_id == 11L)}")
    } finally q.stop()
  }}

  test("tws buffered state survives a stop/restart cycle through the " +
    "checkpoint") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tws_asof_ckpt").toString
    val results = java.util.Collections.synchronizedList(
      new java.util.ArrayList[AsOfMatch]())
    val mem = MemoryStream[AsOfEvent]
    def start() = AsOfStream
      .nearestWithinTws(mem.toDS(), HorizonUs, "5 seconds")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[AsOfMatch],
                       _: Long) => b.collect().foreach(results.add) }
      .start()
    val q1 = start()
    try {
      mem.addData(ev(1L, 1000, isLeft = true, 10L),
        ev(1L, 800, isLeft = false, 20L, value = 5.0),
        ev(1L, 1100, isLeft = false, 21L, value = 7.0))
      q1.processAllAvailable()
      assert(results.isEmpty, "emitted before the horizon closed")
    } finally q1.stop()
    val q2 = start()
    try {
      mem.addData(ev(9L, 3000, isLeft = false, 90L))
      q2.processAllAvailable()
      mem.addData(ev(9L, 3010, isLeft = false, 91L))
      q2.processAllAvailable()
      val got = results.toArray(Array.empty[AsOfMatch])
        .filter(_.user_id == 1L).toSeq
      assert(got.map(m =>
        (m.event_id, m.asof_event_id, m.asof_side)) ==
        Seq((10L, Some(21L), Some("forward"))),
        s"state did not survive the restart: $got")
    } finally q2.stop()
  }}
}

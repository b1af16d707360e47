package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import graft.streaming.StatefulOps._
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** [[TwsStatefulOps]] certification: every twin is decision-identical
  * to its flatMapGroupsWithState original on a shared seeded feed at two
  * batch shapes. Both engines share the fold functions, so the
  * comparison isolates the state plumbing (ValueState/MapState hydration,
  * timer arithmetic, update-mode emission). Update-mode ops emit one row
  * per touched key per batch — identical chunking ⇒ identical emission
  * multisets; sessionize (append mode) compares the closed-session SET
  * after a watermark flush, since WHICH batch a close lands in may
  * differ between the timeout and timer mechanisms.
  */
class TwsStatefulOpsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

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

  private def runOp[T, O](data: Seq[T], chunk: Int, name: String,
                          mode: String, tws: Boolean)
                         (build: Dataset[T] => Dataset[O])
                         (implicit te: Encoder[T], oe: Encoder[O]): Seq[O] = {
    def body: Seq[O] = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[T]
      val q = build(mem.toDS()).writeStream.format("memory")
        .queryName(name).outputMode(mode).start()
      try {
        data.grouped(chunk).foreach { c =>
          mem.addData(c: _*); q.processAllAvailable()
        }
        spark.table(name).as[O].collect().toSeq
      } finally q.stop()
    }
    if (tws) withRocksDb(body) else body
  }

  private def pairMatches[T, O](data: Seq[T], name: String, mode: String)
                               (fm: Dataset[T] => Dataset[O])
                               (tw: Dataset[T] => Dataset[O])
                               (implicit te: Encoder[T], oe: Encoder[O])
  : Unit =
    for (chunk <- Seq(data.size, 37)) {
      val tag = s"${name}_c$chunk"
      val want = runOp(data, chunk, s"${tag}_f", mode, tws = false)(fm)
      val got = runOp(data, chunk, s"${tag}_t", mode, tws = true)(tw)
      assert(got.nonEmpty, s"$tag: empty output")
      assert(got.groupBy(identity).view.mapValues(_.size).toMap ==
        want.groupBy(identity).view.mapValues(_.size).toMap,
        s"$tag: emission multisets differ (${got.size} vs ${want.size})")
    }

  private val Base = 1704067200L

  private val events: Seq[UserEvent] = {
    val rnd = new scala.util.Random(23)
    val types = Seq("view", "view", "click", "purchase")
    (1L to 300L).map { id =>
      UserEvent(1L + rnd.nextInt(20), types(rnd.nextInt(types.size)),
        rnd.nextInt(100).toDouble,
        (Base + id * 7 + rnd.nextInt(5)) * 1000000L, id)
    }
  }

  test("tws user profiles match fMGWS at two batch shapes") {
    pairMatches(events, "tws_prof", "update")(
      ds => StatefulOps.userProfiles(ds))(
      ds => TwsStatefulOps.userProfilesTws(ds))
  }

  test("tws funnel progress matches fMGWS at two batch shapes") {
    val steps = Seq("view", "click", "purchase")
    pairMatches(events, "tws_funnel", "update")(
      ds => StatefulOps.funnelProgress(ds, steps))(
      ds => TwsStatefulOps.funnelProgressTws(ds, steps))
  }

  test("tws heavy hitters (MapState) match fMGWS at two batch shapes") {
    val rnd = new scala.util.Random(29)
    // zipfish item draw so Misra–Gries actually evicts at k=4
    val pairs = (1 to 400).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      val item = s"i${math.min(rnd.nextInt(12), rnd.nextInt(12))}"
      (g, item)
    }
    pairMatches(pairs, "tws_hh", "update")(
      ds => StatefulOps.heavyHittersStream(ds, k = 4))(
      ds => TwsStatefulOps.heavyHittersStreamTws(ds, k = 4))
  }

  test("tws kll quantiles match fMGWS at two batch shapes") {
    val rnd = new scala.util.Random(31)
    val vals = (1 to 500).map { _ =>
      (s"g${rnd.nextInt(3)}", rnd.nextGaussian() * 10 + 50)
    }
    pairMatches(vals, "tws_kll", "update")(
      ds => StatefulOps.kllQuantilesStream(ds, k = 50, qs = Seq(0.5, 0.9)))(
      ds => TwsStatefulOps.kllQuantilesStreamTws(ds, k = 50,
        qs = Seq(0.5, 0.9)))
  }

  test("tws sessionize closed-session set matches fMGWS after the " +
    "watermark flush") {
    val rnd = new scala.util.Random(37)
    val gapUs = 30L * 60 * 1000000L
    val sess = (1L to 300L).map { id =>
      val uid = 1L + rnd.nextInt(12)
      // bursts with occasional > gap jumps so sessions genuinely close
      val sec = id * 120 + rnd.nextInt(60)
      SessionEvent(uid, new Timestamp((Base + sec) * 1000),
        (Base + sec) * 1000000L, rnd.nextInt(10).toDouble, id)
    } :+ SessionEvent(999L,
      new Timestamp((Base + 300 * 120 + 7200) * 1000),
      (Base + 300 * 120 + 7200) * 1000000L, 0.0, 9999L)
    def run(tws: Boolean): Set[ClosedSession] = {
      val build: Dataset[SessionEvent] => Dataset[ClosedSession] =
        if (tws) ds => TwsStatefulOps.sessionizeStreamTws(ds, gapUs, "1 hour")
        else ds => StatefulOps.sessionizeStream(ds, gapUs, "1 hour")
      runOp(sess, 41, s"tws_sess_$tws", "append", tws)(build)
        .filterNot(_.user_id == 999L).toSet
    }
    val want = run(tws = false)
    val got = run(tws = true)
    assert(want.nonEmpty, "fixture closed no sessions")
    assert(got == want,
      s"closed-session sets differ: ${got.size} vs ${want.size}")
  }
}

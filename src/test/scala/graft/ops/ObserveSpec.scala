package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ObserveSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("quality metrics ride the action — no second scan") {
    val orders = graft.etl.Readers.table(spark, dir, "orders")
    val (observed, obs) = Observe.withQualityMetrics(
      orders, "o_custkey", "o_totalprice")
    // ONE action: the aggregation the pipeline was running anyway
    val revenue = observed.agg(round(sum("o_totalprice"), 2)).collect()(0)
    val m = obs.get
    // metrics describe the same rows the action consumed
    assert(m("n_rows") == orders.count())
    assert(m("n_null_key") == 0L)
    val (lo, hi) = (m("min_value").asInstanceOf[Double],
      m("max_value").asInstanceOf[Double])
    assert(lo > 0.0 && hi >= lo)
    assert(revenue.getDouble(0) > 0.0)
  }

  test("placement defines meaning: metrics after a filter see filtered rows") {
    val orders = graft.etl.Readers.table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val (observed, obs) = Observe.withMetrics(orders, "urgent_audit",
      Seq(count(lit(1)).as("n"),
        count(when(col("o_totalprice") > 150000.0, 1)).as("n_big")))
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n") == orders.count())
    assert(m("n_big").asInstanceOf[Long] <= m("n").asInstanceOf[Long])
  }

  test("streaming: the same observe node reports per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)]
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = mem.toDF().toDF("id", "v")
      .observe("stream_audit", count(lit(1)).as("n"))
      .writeStream.format("noop")
      .start()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryProgressEvent): Unit = {
        val om = e.progress.observedMetrics
        if (om.containsKey("stream_audit"))
          seen.addAndGet(om.get("stream_audit").getAs[Long]("n"))
      }
    }
    spark.streams.addListener(listener)
    try {
      mem.addData((1L, 1.0), (2L, 2.0), (3L, 3.0))
      q.processAllAvailable()
      mem.addData((4L, 4.0))
      q.processAllAvailable()
      // listener delivery is async — wait briefly for the progress events
      val deadline = System.nanoTime() + 10_000_000_000L
      while (seen.get() < 4 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(seen.get() == 4L, s"observed ${seen.get()} rows, expected 4")
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}

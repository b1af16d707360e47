package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("gapFill densifies each series onto its own [min, max] grid") {
    val obs = Seq(("a", 3L, 1.0), ("a", 6L, 2.0), ("b", 10L, 5.0))
      .toDF("s", "t", "v")
    val out = TimeSeries.gapFill(obs, "s", "t")
      .as[(String, Long, Option[Double])].collect().toSet
    assert(out == Set(
      ("a", 3L, Some(1.0)), ("a", 4L, None), ("a", 5L, None),
      ("a", 6L, Some(2.0)), ("b", 10L, Some(5.0))))
  }

  test("fillInterpolate: ffill carries, interp is linear, edges clamp") {
    val dense = Seq(
      ("a", 1L, None), ("a", 2L, Some(10.0)), ("a", 3L, None),
      ("a", 4L, None), ("a", 5L, Some(40.0)), ("a", 6L, None))
      .toDF("s", "t", "v")
    val out = TimeSeries.fillInterpolate(dense, "s", "t", "v")
      .select("t", "ffill", "interp")
      .as[(Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((None, Some(10.0))))         // edge → nearest
    assert(out(2L) == ((Some(10.0), Some(10.0))))   // observed
    assert(out(3L) == ((Some(10.0), Some(20.0))))   // 1/3 of the way
    assert(out(4L) == ((Some(10.0), Some(30.0))))   // 2/3
    assert(out(5L) == ((Some(40.0), Some(40.0))))
    assert(out(6L) == ((Some(40.0), Some(40.0))))   // trailing edge
  }

  test("ewmaTruncated: weighted window, head normalizes by present weights") {
    val df = TimeSeries.withEwmaTruncated(
      Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0))
        .toDF("s", "t", "v"),
      "ewma", col("s"), col("t"), col("v"), 0.5, 2)
    val out = df.select("t", "ewma").as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 10.0) < 1e-12)                      // head: only itself
    assert(math.abs(out(2L) - (20.0 + 0.5 * 10.0) / 1.5) < 1e-12)
    assert(math.abs(out(3L) - (30.0 + 0.5 * 20.0) / 1.5) < 1e-12) // depth 2 drops t=1
  }

  test("resample: deterministic open/close with tied timestamps") {
    val obs = Seq(
      // bucket 0: ties at t=1 (values 5,3) and t=9 (values 7,2)
      ("a", 1L, 5.0), ("a", 1L, 3.0), ("a", 4L, 9.0),
      ("a", 9L, 7.0), ("a", 9L, 2.0),
      // bucket 1: single row
      ("a", 12L, 4.0))
      .toDF("s", "t", "v")
    val out = TimeSeries.resample(obs, "s", (col("t") / 10).cast("long"),
        "t", "v")
      .select("bucket", "n", "vmin", "vmax", "open", "close")
      .as[(Long, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 5L, 2.0, 9.0, 3.0, 2.0)))
    assert(out(1L) == ((1L, 1L, 4.0, 4.0, 4.0, 4.0)))
  }
}

package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("profile: nulls, distincts, numeric-only min/max in one pass") {
    val df = Seq(
      (Some(1L), Some("a"), Some(1.5)),
      (Some(2L), None, Some(-2.0)),
      (None, Some("a"), None)
    ).toDF("id", "s", "v")
    val p = Profiling.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 1 && p("id").getLong(2) == 2)
    assert(p("id").getDouble(3) == 1.0 && p("id").getDouble(4) == 2.0)
    assert(p("s").getLong(1) == 1 && p("s").getLong(2) == 1)
    assert(p("s").isNullAt(3) && p("s").isNullAt(4))   // non-numeric
    assert(p("v").getDouble(3) == -2.0 && p("v").getDouble(4) == 1.5)
    // the sketch contract certifies itself on every column
    assert(p.values.forall(_.getBoolean(5)))
  }

  test("profile plan: lazy, no multi-distinct Expand, no exact-Percentile") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "s")
    val prof = Profiling.profile(df) // must not run a job here
    val plan = prof.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "multi-distinct Expand leaked back into the profile plan")
    assert(plan.contains("approx_count_distinct") ||
      plan.contains("HyperLogLog"), "expected HLL sketch in one-pass agg")
    assert(prof.collect().length == 2)
  }

  test("histogram: underflow 0, overflow n+1, boundaries to the right bin, null bucket") {
    val df = Seq(Some(-1.0), Some(0.0), Some(9.99), Some(10.0), Some(25.0),
      Some(30.0), None).toDF("v")
    val h = Profiling.histogram(df, col("v"), lo = 0.0, hi = 30.0, buckets = 3)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1))).toMap
    assert(h(Some(0L)) == 1)      // -1 underflows
    assert(h(Some(1L)) == 2)      // 0.0 and 9.99
    assert(h(Some(2L)) == 1)      // 10.0 lands in bin 2 (left-closed)
    assert(h(Some(3L)) == 1)      // 25.0
    assert(h(Some(4L)) == 1)      // 30.0 overflows (hi exclusive)
    assert(h(None) == 1)          // null bucket
  }

  test("histogram: an in-range value one ULP under hi never overflows") {
    // (c - lo)/step rounds up to exactly `buckets` here without the clamp
    val c0 = 0.09999999999999999
    val df = Seq(c0).toDF("v")
    val h = Profiling.histogram(df, col("v"), lo = 0.0, hi = 0.1, buckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(h == Map(3L -> 1L))   // clamped into the top REAL bin, not 4
  }
}

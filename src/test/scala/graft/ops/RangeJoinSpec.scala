package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val dim = Seq(
    (0.0, 10.0, "low"),
    (10.0, 20.0, "mid"),
    (5.0, 25.0, "wide")     // overlaps both — a value can match 2 intervals
  ).toDF("lo", "hi", "tier")

  test("bucketedBetween: [lo, hi) semantics, overlapping intervals, misses") {
    val fact = Seq((1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 24.999), (5L, 25.0),
      (6L, -1.0)).toDF("id", "v")
    val out = RangeJoin.bucketedBetween(fact, "v", dim, "lo", "hi", 4.0)
      .select("id", "tier").as[(Long, String)].collect().toSet
    assert(out == Set(
      (1L, "low"),                 // lo inclusive
      (2L, "low"), (2L, "wide"),
      (3L, "mid"), (3L, "wide"),   // hi exclusive for "low"
      (4L, "wide")                 // 25.0 excluded, 24.999 in
    ))
  }

  test("bucketedBetween matches the naive inequality join on random data") {
    val r = new scala.util.Random(7)
    val fact = Seq.tabulate(300)(i => (i.toLong, r.nextDouble() * 30 - 2))
      .toDF("id", "v")
    val expected = fact.join(dim, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "tier").as[(Long, String)].collect().toSet
    for (width <- Seq(1.0, 4.0, 10.0, 50.0)) {
      val got = RangeJoin.bucketedBetween(fact, "v", dim, "lo", "hi", width)
        .select("id", "tier").as[(Long, String)].collect().toSet
      assert(got == expected, s"bucketWidth=$width")
    }
  }
}

package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-sketch operators (HLL distinct counts, t-digest quantiles).
  * Sketch implementations differ across engines, so these are not
  * DuckDB-oracle queries — correctness is bounded-error against the exact
  * answer, the contract a 100 TB deployment actually relies on (sketches
  * aggregate with map-side partials; the exact versions shuffle far more).
  */
class SketchSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val (approx, exact) = li.agg(
      approx_count_distinct("l_partkey").as("a"),
      countDistinct("l_partkey").as("e"))
      .as[(Long, Long)].collect()(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx percentile brackets the exact median") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val approxMedian = li
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .as[Double].collect()(0)
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0)(0)
    assert(math.abs(approxMedian - exact) / exact < 0.01)
  }
}

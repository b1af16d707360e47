package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  // 100×a, 50×b, 10 singletons; n=160
  private def skewed = (Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
    (1 to 10).map(i => s"rare$i"))

  test("MG bound holds through map-side partials and merges") {
    val n = skewed.size
    val k = 3
    val exact = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // many partitions → many partial sketches → real merge path
    val out = skewed.toDF("item").repartition(8)
      .agg(HeavyHittersFunctions.heavyHitters(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("e")).select("e.item", "e.est")
      .as[(String, Long)].collect().toMap
    assert(out.size <= k)
    val slack = n.toDouble / (k + 1)
    // every true heavy hitter is present…
    exact.filter(_._2 > slack).keys.foreach(i => assert(out.contains(i)))
    // …and every estimate is an under-count by at most n/(k+1)
    out.foreach { case (i, est) =>
      val t = exact(i)
      assert(est <= t && est >= t - slack, s"$i: est=$est true=$t")
    }
  }

  test("k larger than distinct items → exact counts") {
    val out = skewed.toDF("item").repartition(5)
      .agg(HeavyHittersFunctions.heavyHitters(col("item"), 64).as("hh"))
      .select(explode(col("hh")).as("e")).select("e.item", "e.est")
      .as[(String, Long)].collect().toMap
    assert(out("a") == 100L && out("b") == 50L && out.size == 12)
  }

  test("SQL surface graft_heavy_hitters + analysis-time type check") {
    skewed.toDF("item").createOrReplaceTempView("hh_in")
    val top = spark.sql(
        "SELECT inline(graft_heavy_hitters(item, 2)) FROM hh_in")
      .as[(String, Long)].collect()
    assert(top.head._1 == "a")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_heavy_hitters(CAST(1 AS INT), 2) FROM hh_in")
        .collect()
    }
    assert(err.getMessage.contains("STRING"))
  }
}

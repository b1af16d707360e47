package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsExtSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx sketches stay inside their error bounds vs exact answers") {
    val est = AnalyticsExt.aggApproxSketch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = graft.etl.Readers.table(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("nd"),
        percentile(col("l_extendedprice"), lit(0.5)).as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (flag, (nd, p50)) =>
      val (ndEst, p50Est) = est(flag)
      // HLL++ at rsd=0.02: generous 5x margin on the nominal std error
      assert(math.abs(ndEst - nd).toDouble / nd <= 0.10, s"$flag nd $ndEst vs $nd")
      // GK sketch with accuracy 10000 on ~2k rows per group is near-exact
      assert(math.abs(p50Est - p50) / p50 <= 0.05, s"$flag p50 $p50Est vs $p50")
    }
  }

  test("grouping sets emit exactly the requested groupings") {
    val rows = AnalyticsExt.aggGroupingSets(spark, sf).collect()
    val gids = rows.map(_.getLong(rows.head.fieldIndex("gid"))).toSet
    // (flag) → linestatus aggregated = 01b = 1; (status) → 10b = 2; () → 3
    assert(gids == Set(1L, 2L, 3L))
    val grand = rows.filter(_.getLong(rows.head.fieldIndex("gid")) == 3L)
    assert(grand.length == 1)
  }

  test("as-of join query: every click row appears exactly once") {
    val clicks = graft.etl.Readers.events(spark, sf)
      .filter(col("event_type") === "click").count()
    val out = AnalyticsExt.joinAsof(spark, sf)
    assert(out.count() == clicks)
    assert(out.select("event_id").distinct().count() == clicks)
  }

  test("hash sample is the same subset the oracle predicate selects") {
    val viaOp = graft.ops.Sampling.hashSample(
        graft.etl.Readers.table(spark, sf, "customer"), col("c_custkey"), 1, 10)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val viaSql = graft.etl.Readers.table(spark, sf, "customer")
      .filter(expr(
        "conv(substring(md5(cast(c_custkey as string)), 1, 8), 16, 10) % 10 < 1"))
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(viaOp == viaSql && viaOp.nonEmpty)
  }
}

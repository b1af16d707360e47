package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsExtSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx sketches stay inside their error bounds vs exact answers") {
    // the query now carries its own tolerance assertion as boolean columns
    // (nd_ok, p50_ok) so the DuckDB oracle can hash-match; the spec checks
    // every group self-asserts true and the exact counts are sane
    val rows = AnalyticsExt.aggApproxSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      assert(r.getLong(1) > 0 && r.getLong(2) > 0, s"$flag empty group")
      assert(r.getBoolean(3), s"$flag nd estimate outside 6% of exact")
      assert(r.getBoolean(4), s"$flag p50 estimate outside 1% of exact")
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

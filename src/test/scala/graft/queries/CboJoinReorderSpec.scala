package graft.queries

import graft.TestSpark
import graft.ops.CatalogStats
import org.scalatest.funsuite.AnyFunSuite

/** Pins the cost-based join rotation behind the `cbo_join_reorder` key:
  * with column statistics and `spark.sql.cbo.joinReorder` on, the
  * optimized plan joins the ~19-row filtered `part` dimension BEFORE the
  * orders join (shrinking the fact first); with CBO off the plan keeps
  * the written lineitem→orders order. Results are identical either way —
  * the rotation is pure plan shape, which is exactly why the oracle alone
  * cannot certify it.
  */
class CboJoinReorderSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Join order as the sequence of right-side relation names, innermost
    * first — `cbo_part` before `cbo_orders` means part joined first.
    */
  private def joinOrder(plan: String): Seq[String] =
    "graft_cbo_(lineitem|orders|part)".r.findAllMatchIn(plan)
      .map(_.group(1)).toSeq.distinct

  test("statistics rotate the selective dimension below the orders join") {
    val t = CatalogStats.ensureStarStats(spark, dir)
    val sql = SqlSurface.cboStarSql(t)
    val onPlan = CatalogStats.withCbo(spark) {
      spark.sql(sql).queryExecution.optimizedPlan.toString
    }
    val offPlan = spark.sql(sql).queryExecution.optimizedPlan.toString
    // plan rendering walks left-deep joins top-down: the INNERMOST join's
    // relations print first. CBO-on must touch lineitem, then part.
    assert(joinOrder(onPlan) === Seq("lineitem", "part", "orders"), onPlan)
    assert(joinOrder(offPlan) === Seq("lineitem", "orders", "part"), offPlan)
  }

  test("the rotation never changes results, and the conf is restored") {
    val t = CatalogStats.ensureStarStats(spark, dir)
    val sql = SqlSurface.cboStarSql(t)
    val on = CatalogStats.withCbo(spark)(spark.sql(sql).collect().toSeq)
    val off = spark.sql(sql).collect().toSeq
    assert(on === off)
    assert(spark.conf.get("spark.sql.cbo.enabled") === "false")
  }
}

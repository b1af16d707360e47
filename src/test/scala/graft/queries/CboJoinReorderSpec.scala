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

  /** The `cboOptimized` splice contract behind the two
    * `window_partitioned_*` keys: the returned frame is LAZY (no driver
    * collect of the linear-in-data result), yet actions taken AFTER the
    * conf restore still execute the CBO-gated rewrite — because the
    * CBO-optimized plan IS the frame's logical plan, re-optimized but
    * never un-rewritten. The old contract collected inside the scope:
    * correct, but a driver-side materialization that grows linearly
    * with the data — a scale-killer in the wrapper of exactly the keys
    * that demonstrate scale-safety.
    */
  test("window_partitioned_auto: lazy splice keeps the rewrite in the " +
    "post-restore executed plan, with no partitioned WindowExec") {
    // construction happens with DEFAULT session conf except shuffle
    // partitions: the test session runs 4, where NDV(l_linenumber)=7
    // correctly fails the 2·NDV ≤ partitions proof — scope up to the
    // production 32 for the optimization (the helper scopes CBO and the
    // demo floor internally and must restore both)
    val df = CatalogStats.withConf(spark,
      "spark.sql.shuffle.partitions" -> "32") {
      SqlSurface.windowPartitionedAuto(spark, dir)
    }
    assert(spark.conf.get("spark.sql.cbo.enabled") === "false")
    assert(spark.conf
      .getOption(graft.plans.DistributeGlobalRank.PartitionedMinRowsKey)
      .isEmpty, "demo floor leaked out of the scoped conf")
    // the returned frame's logical plan is the spliced rewrite: forcing
    // the EXECUTED plan here (outside the scope, fresh QueryExecution
    // over that logical plan) must still show Ranking's machinery and
    // no user-keyed window sort
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("__graft"),
      "the CBO-on rewrite did not survive the conf restore")
    val hasUserWindow = graft.plans.PlanLint.initialPlan(df).exists {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.nonEmpty &&
          !w.partitionSpec.forall(_.references.forall(
            _.name.startsWith("__graft")))
      case _ => false
    }
    assert(!hasUserWindow,
      "spliced plan still sorts a user-keyed window partition")
    // and the splice changes no values: equal to the plain naive SQL
    val t = CatalogStats.ensureStarStats(spark, dir)
    val naive = spark.sql(SqlSurface.windowPartitionedAutoSql
      .replace("FROM lineitem", s"FROM ${t("lineitem")}"))
    assert(df.orderBy("l_linenumber", "l_orderkey").collect().toSeq ===
      naive.collect().toSeq)
  }
}

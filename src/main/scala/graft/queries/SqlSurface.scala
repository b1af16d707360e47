package graft.queries

import graft.etl.Readers
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Correlated-subquery SQL surface: TPC-H Q4/Q17/Q21-shaped queries issued
  * through `spark.sql` over temp views of the testdata tables — the one
  * operator class the DataFrame DSL never exercises, because EXISTS /
  * NOT EXISTS / correlated scalar subqueries only exist in the SQL parser
  * and are planned by Catalyst's subquery rewrites
  * (`RewritePredicateSubquery` → existence semi/anti joins,
  * `RewriteCorrelatedScalarSubquery` → aggregate + join).
  *
  * The testdata lacks `l_commitdate`/`l_receiptdate`, so the classic
  * "late delivery" predicate is re-expressed as `l_returnflag = 'R'`
  * (a returned item) — the SHAPE is the certified artifact: each key's
  * plan must show hash-equi semi/anti joins, never a
  * BroadcastNestedLoopJoin (pinned in PlanShapeSpec).
  *
  * Scale notes (100 TB): after the rewrites these are ordinary shuffled
  * hash/sort-merge joins on the correlation key (`o_orderkey` /
  * `l_partkey`), so they partition and scale exactly like the explicit
  * join formulations elsewhere in this library; Q21's orders join and its
  * two subqueries all correlate on `l_orderkey`, so every lineitem branch
  * shuffles on the SAME key — the semi, anti, and inner joins stack
  * co-partitioned with no intermediate re-exchange (the branches carry
  * different pushed filters, so they are distinct scans, not a literally
  * reused exchange).
  */
object SqlSurface {

  /** Register the testdata tables this module queries as temp views
    * (idempotent; views resolve through the memoized [[Readers.table]]
    * scans, so re-registration never re-lists files).
    */
  private def registerViews(spark: SparkSession, dir: String): Unit =
    Seq("orders", "lineitem", "part", "supplier").foreach { t =>
      Readers.table(spark, dir, t).createOrReplaceTempView(t)
    }

  /** TPC-H Q4 shape — priority count of 1996 orders having at least one
    * returned line item. The correlated EXISTS plans as a left-semi join
    * of orders against lineitem on the order key: lineitem is reduced to
    * distinct keys map-side, and the date filter pushes into the orders
    * scan before the exchange.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val q4OrderPrioritySql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q17 shape — yearly revenue lost if small-quantity orders of one
    * brand's parts were dropped: `l_quantity` below half the part's mean
    * quantity. The correlated scalar average is rewritten by Catalyst
    * into a per-`l_partkey` aggregate joined back to the fact — both
    * sides shuffle on the same part key (map-side partial aggregation
    * shrinks the aggregate branch before its exchange). The threshold
    * comparison
    * is engine-stable: quantities are integral doubles, so the per-part
    * sums (and hence the averages) are EXACT in any summation order.
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT round(sum(l_extendedprice) / 7.0D, 2) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#4'
        |  AND l_quantity < (SELECT 0.5D * avg(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
  }

  val q17SmallQtySql: String =
    """SELECT round(sum(l_extendedprice) / 7.0::DOUBLE, 2) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#4'
      |  AND l_quantity < (SELECT 0.5::DOUBLE * avg(l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q21 shape — suppliers who were the SOLE returned-item supplier
    * on a finalized multi-supplier order: EXISTS (another supplier's line
    * on the order) AND NOT EXISTS (another supplier's RETURNED line).
    * Catalyst plans the pair as a left-semi plus a left-anti join, both
    * correlating on `l_orderkey` — the same key the orders join uses, so
    * at scale the three meet on one lineitem exchange. Top-100 with the
    * (numwait DESC, s_name) total order.
    */
  def q21WaitSuppliers(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin)
  }

  val q21WaitSuppliersSql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q4_order_priority" -> q4OrderPriority,
    "q17_small_qty" -> q17SmallQty,
    "q21_wait_suppliers" -> q21WaitSuppliers
  )

  val oracle: Map[String, String] = Map(
    "q4_order_priority" -> q4OrderPrioritySql,
    "q17_small_qty" -> q17SmallQtySql,
    "q21_wait_suppliers" -> q21WaitSuppliersSql
  )
}

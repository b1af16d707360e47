package graft.queries

import graft.etl.Readers
import graft.ops.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout queries: Z-order clustering quality over `orders`.
  *
  * The query computes the Morton key a writer would
  * `repartitionByRange(z).sortWithinPartitions(z)` by, then groups rows
  * into contiguous z-blocks (a stand-in for output files) and reports
  * each block's min/max span in BOTH interleaved dimensions — exactly the
  * per-file statistics min/max data skipping reads. Tight spans in both
  * columns are the evidence the layout prunes scans filtered on either
  * dimension; a single-column sort would show full-range spans in the
  * other column.
  */
object LayoutQueries {

  val ZBits = 8           // 256 buckets per dimension, 16-bit z key
  val PriceBucketWidth = 2500.0
  val ZBlockShift = 8     // 256 z-values per block → up to 256 blocks

  /** Per-z-block clustering ledger: row count plus min/max of both
    * bucketized dims ([[Layout.morton2]]). `cust_b` = o_custkey mod 256
    * (id-ish dim), `price_b` = o_totalprice bucketized at 2500/bucket and
    * clamped to 8 bits (value-ish dim).
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val custB = (col("o_custkey") % 256).as("cust_b")
    val priceB = least(floor(col("o_totalprice") / PriceBucketWidth),
      lit(255L)).as("price_b")
    Readers.table(spark, dir, "orders")
      .select(col("o_orderkey"), custB, priceB)
      .select(col("o_orderkey"), col("cust_b"), col("price_b"),
        Layout.morton2(col("cust_b"), col("price_b"), ZBits).as("z"))
      .groupBy(shiftright(col("z"), ZBlockShift).as("z_block"))
      .agg(count(lit(1)).as("n_rows"),
        min("cust_b").as("cust_lo"), max("cust_b").as("cust_hi"),
        min("price_b").as("price_lo"), max("price_b").as("price_hi"))
      .orderBy("z_block")
  }

  val zorderLayoutSql: String = {
    // the same interleave, spelled in integer div/mod arithmetic
    val z = (0 until ZBits).map { i =>
      s"((cust_b // ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + ((price_b // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT o_orderkey, o_custkey % 256 AS cust_b,
       |    least(floor(o_totalprice / $PriceBucketWidth), 255)::BIGINT
       |      AS price_b
       |  FROM orders
       |),
       |zb AS (SELECT o_orderkey, cust_b, price_b, ($z) AS z FROM b)
       |SELECT z // ${1L << ZBlockShift} AS z_block,
       |  count(*) AS n_rows,
       |  min(cust_b) AS cust_lo, max(cust_b) AS cust_hi,
       |  min(price_b) AS price_lo, max(price_b) AS price_hi
       |FROM zb GROUP BY 1 ORDER BY z_block""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_layout" -> zorderLayout)

  val oracle: Map[String, String] = Map(
    "zorder_layout" -> zorderLayoutSql)
}

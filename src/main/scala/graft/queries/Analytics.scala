package graft.queries

import graft.etl.Readers
import graft.ops.{RuntimeFilter, Sessionize, SkewJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extension operators the reference lacks (SURVEY §2.9 / §7.3 step 7):
  * group-by aggregation, distinct aggregation, sort/top-k, ranking windows,
  * set operations, JSON extraction, tumbling time windows, sessionization.
  *
  * Determinism: every result carries a total ORDER BY; double aggregates
  * are rounded after aggregation (partial-agg summation order differs
  * across partitionings by ULPs — SURVEY §7.4 risk 6).
  */
object Analytics {

  /** TPC-H Q1-style pricing summary: hash aggregate with map-side partial
    * aggregation; the only shuffle carries pre-aggregated partials (6 rows
    * per mapper), so this scales linearly to 100 TB.
    */
  def aggPricingSummary(spark: SparkSession, dir: String): DataFrame =
    Readers.table(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_extendedprice"), 6).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val aggPricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0::DOUBLE - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_extendedprice), 6) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Top-k by value: Catalyst plans orderBy+limit as TakeOrderedAndProject —
    * a per-partition heap of k rows then a k-row merge on the driver; no
    * global sort ever materializes.
    */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    Readers.table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  val topkOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** Ranking window: top-3 customers per market segment. One shuffle on the
    * partition key; rank streams within each group.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Readers.table(spark, dir, "customer")
      .withColumn("rank_in_segment", row_number().over(w))
      .filter(col("rank_in_segment") <= 3)
      .select("c_mktsegment", "rank_in_segment", "c_custkey", "c_acctbal")
      .orderBy("c_mktsegment", "rank_in_segment")
  }

  val windowRankSql: String =
    """SELECT c_mktsegment, rank_in_segment, c_custkey, c_acctbal
      |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
      |        row_number() OVER (PARTITION BY c_mktsegment
      |                           ORDER BY c_acctbal DESC, c_custkey) AS rank_in_segment
      |      FROM customer)
      |WHERE rank_in_segment <= 3
      |ORDER BY c_mktsegment, rank_in_segment""".stripMargin

  /** Partitioned row_number WITHOUT a hash-partitioned window
    * ([[graft.ops.Ranking.withPartitionedRowNumber]]): a plain
    * `PARTITION BY user_id` window shuffles by key and sorts EACH KEY
    * IN ONE TASK — un-splittable under a power-law key (AQE splits
    * skewed join probes, never window sorts), so the heaviest user
    * bounds the stage at any cluster size. The skew-free form derives
    * the per-key rank from one range-split GLOBAL rank over
    * (user_id, ts, event_id) minus a broadcast-joinable per-key base —
    * every sort task holds ~n/P contiguous rows whatever the key
    * histogram says. The oracle runs the naive window; results must
    * match row-for-row (the order is total, so ranks are
    * deterministic).
    */
  def windowRankSkewfree(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Ranking.withPartitionedRowNumber(
        Readers.events(spark, dir),
        Seq(col("user_id")), Seq(col("ts"), col("event_id")), "rn")
      .filter(col("event_id") % 53 === 0)
      .select(col("user_id"), col("event_id"), col("rn"))
      .orderBy("user_id", "event_id")

  val windowRankSkewfreeSql: String =
    """SELECT user_id, event_id, rn FROM (
      |  SELECT user_id, event_id,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events)
      |WHERE event_id % 53 = 0
      |ORDER BY user_id, event_id""".stripMargin

  /** The skew-free twin for running totals
    * ([[graft.ops.Ranking.withPartitionedRunningSums]]): per-user
    * cumulative event count and cents-exact cumulative value, derived
    * from ONE global range-split prefix pass (inclusive/exclusive sums
    * + non-null counts) minus per-key first-row bases picked by
    * `min_by(…, rank)` — no per-key single-task sort anywhere, so a
    * power-law user cannot bound the stage. Values go through integer
    * cents before summing, keeping the distributed subtraction
    * bit-exact; the oracle runs the naive partitioned window.
    */
  def windowRunningSkewfree(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Ranking.withPartitionedRunningSums(
        Readers.events(spark, dir).withColumn("cents",
          round(col("value") * 100).cast("long")),
        Seq(col("user_id")), Seq(col("ts"), col("event_id")),
        Seq((col("cents"), "cum_cents"), (lit(1L), "cum_n")))
      .filter(col("event_id") % 53 === 0)
      .select(col("user_id"), col("event_id"), col("cum_n"),
        col("cum_cents"))
      .orderBy("user_id", "event_id")

  val windowRunningSkewfreeSql: String =
    """SELECT user_id, event_id,
      |  CAST(cum_n AS BIGINT) AS cum_n,
      |  CAST(cum_cents AS BIGINT) AS cum_cents
      |FROM (
      |  SELECT user_id, event_id,
      |    count(*) OVER (PARTITION BY user_id
      |                   ORDER BY ts, event_id) AS cum_n,
      |    sum(CAST(round(value * 100) AS BIGINT)) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS cum_cents
      |  FROM events)
      |WHERE event_id % 53 = 0
      |ORDER BY user_id, event_id""".stripMargin

  /** Analytic window frames: per-customer running order total and
    * order-over-order delta (cumulative sum + lag over a date-ordered
    * frame) — the frame/analytic family beyond ranking.
    */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Readers.table(spark, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"),
        round(sum("o_totalprice").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_total"),
        round(col("o_totalprice")
          - coalesce(lag("o_totalprice", 1).over(w), lit(0.0)), 2)
          .as("delta_prev"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  val windowRunningSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  round(sum(o_totalprice) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS UNBOUNDED PRECEDING), 2) AS running_total,
      |  round(o_totalprice - coalesce(lag(o_totalprice, 1) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0.0::DOUBLE), 2)
      |    AS delta_prev
      |FROM orders WHERE o_custkey < 100
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** TPC-H Q3-style shipping priority: the segment-filtered
    * customer⋈orders⋈lineitem join with the classic "ordered before the
    * cutoff, shipped after it" predicate pair, top-10 open orders by
    * revenue. Plan shape: both date filters push into the parquet scans,
    * the filtered customer side broadcasts, orders⋈lineitem shuffles on
    * the order key, and the 10-row cut is a TakeOrdered over ROUNDED
    * revenue (round-then-rank with id tiebreaks keeps the kept set
    * engine-stable), never a global sort.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = "1996-06-01"
    val cust = Readers.table(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Readers.table(spark, dir, "orders")
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Readers.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingPrioritySql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1.0::DOUBLE - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1996-06-01'
      |  AND l_shipdate > TIMESTAMP '1996-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style local-supplier revenue: the six-way join (region →
    * nation → supplier/customer → orders → lineitem) with the
    * same-nation constraint between customer and supplier. Plan shape at
    * 100 TB: region/nation/supplier/customer all broadcast (each orders
    * of magnitude under the fact tables — the join tree never shuffles a
    * dimension), the year predicate pushes into the orders scan, and the
    * single real shuffle is orders⋈lineitem on the order key ahead of a
    * 25-group aggregate.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val asia = Readers.table(spark, dir, "region")
      .filter(col("r_name") === "ASIA").select("r_regionkey")
    val nat = Readers.table(spark, dir, "nation")
      .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supp = Readers.table(spark, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    val cust = Readers.table(spark, dir, "customer")
      .select("c_custkey", "c_nationkey")
    val ord = Readers.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Readers.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    ord.join(li, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5LocalSupplierSql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0::DOUBLE - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Distinct aggregation + dimension join: per-nation customer stats.
    * Nation is tiny → broadcast; count(distinct) expands to a two-phase
    * aggregate (Catalyst rewrites it; no driver collect).
    */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    Readers.table(spark, dir, "customer")
      .join(broadcast(Readers.table(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("customers"),
        countDistinct("c_mktsegment").as("segments"),
        round(sum("c_acctbal"), 2).as("total_acctbal"))
      .orderBy("n_name")

  val aggDistinctSql: String =
    """SELECT n_name, count(*) AS customers,
      |  count(DISTINCT c_mktsegment) AS segments,
      |  round(sum(c_acctbal), 2) AS total_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Hierarchical totals via ROLLUP (returnflag → linestatus → grand
    * total). Catalyst expands the grouping sets into one Expand + hash
    * aggregate — still a single shuffle.
    */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    Readers.table(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"),
        count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val aggRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty, count(*) AS n,
      |  round(sum(l_extendedprice), 2) AS sum_price
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Set operations in one result: customers with no orders (EXCEPT),
    * customers with orders (INTERSECT). Both are shuffle-dedup ops on the
    * key — same cost shape as a distinct aggregate.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val custKeys = Readers.table(spark, dir, "customer").select(col("c_custkey").as("k"))
    val orderCust = Readers.table(spark, dir, "orders").select(col("o_custkey").as("k"))
    val except = custKeys.except(orderCust).withColumn("op", lit("no_orders"))
    val intersect = custKeys.intersect(orderCust).withColumn("op", lit("with_orders"))
    except.unionByName(intersect).select("op", "k").orderBy("op", "k")
  }

  val setOpsSql: String =
    """SELECT op, k FROM (
      |  SELECT 'no_orders' AS op, k FROM
      |    (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
      |  UNION ALL
      |  SELECT 'with_orders' AS op, k FROM
      |    (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
      |) ORDER BY op, k""".stripMargin

  /** Semi-structured extraction: pull a typed metric out of the JSON props
    * column and aggregate. `get_json_object` evaluates per row inside
    * codegen — no UDF, no driver round-trip.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Readers.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"),
        col("value"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        round(avg("value"), 6).as("avg_value"))
      .orderBy("event_type")

  val jsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(avg(value), 6) AS avg_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Map-typed semi-structured processing: parse the JSON props into a
    * typed map, explode to (key, value) pairs, aggregate per key. The map
    * never reaches the output schema (exploded first), keeping the result
    * comparable across engines.
    */
  def mapOps(spark: SparkSession, dir: String): DataFrame =
    Readers.events(spark, dir)
      .select(col("event_type"),
        explode(from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType))).as(Seq("k", "v")))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"),
        countDistinct("event_type").as("n_types"))
      .orderBy("k")

  val mapOpsSql: String =
    """SELECT k, count(*) AS n,
      |  CAST(sum(CAST(props->>k AS BIGINT)) AS BIGINT) AS sum_v,
      |  count(DISTINCT event_type) AS n_types
      |FROM (SELECT event_type, props, unnest(json_keys(props)) AS k FROM events)
      |GROUP BY k ORDER BY k""".stripMargin

  /** Array function family over tokenized text: distinct, sort, slice,
    * containment — flattened to scalar columns for cross-engine compare.
    */
  def arrayOps(spark: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    Readers.table(spark, dir, "documents")
      .select(col("doc_id"),
        size(array_distinct(w)).cast("long").as("n_distinct"),
        concat_ws(",", slice(sort_array(array_distinct(w)), 1, 3))
          .as("first3_sorted"),
        array_contains(w, "spark").as("has_spark"),
        element_at(w, 1).as("first_token"))
      .orderBy("doc_id")
  }

  val arrayOpsSql: String =
    """SELECT doc_id,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
      |    AS first3_sorted,
      |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
      |  string_split(text, ' ')[1] AS first_token
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Tumbling one-hour time windows (batch twin of the Structured Streaming
    * windowed aggregation). `window()` is a row-local bucket computation —
    * the only shuffle is the group-by.
    */
  def tumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Readers.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")

  val tumblingWindowSql: String =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
      |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Skew-salted fact⟕dim join: lineitem's orderkey salted into 4 buckets,
    * orders replicated 4× — identical results to the plain join (the
    * oracle IS the plain join), different shuffle distribution. See
    * [[graft.ops.SkewJoin]].
    */
  def joinSalted(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Readers.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val ordersDim = Readers.table(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"),
        col("o_orderstatus"))
    SkewJoin.saltedLeftJoin(lineitem, ordersDim, "l_orderkey",
        hash(col("l_linenumber")), saltBuckets = 4)
      // NOT pinned before the sort (r17 sweep): a pin measured exactly
      // 1.00x — the sort itself, not the sampler's re-run of the
      // broadcast probe, is this key's cost — and it would have put the
      // broadcast exchange under a construction-time AQE resolve
      .orderBy("l_orderkey", "l_linenumber")
  }

  val joinSaltedSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice, o_orderstatus
      |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Gap-based sessionization (30-minute inactivity). See
    * [[graft.ops.Sessionize]] for the plan-shape discussion.
    */
  def sessionizeQ(spark: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(Readers.events(spark, dir),
        col("user_id"), col("ts"), col("event_id"),
        gapMicros = 30L * 60 * 1000000,
        aggs = Seq(round(sum("value"), 2).as("sum_value")))
      .withColumnRenamed("key", "user_id")
      .orderBy("user_id", "session_no")

  val sessionizeSql: String =
    """SELECT user_id, session_no,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id
      |                           ORDER BY CAST(ts AS TIMESTAMP), event_id
      |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      |  FROM (
      |    SELECT user_id, ts, value, event_id,
      |      CASE WHEN prev_us IS NULL
      |                OR epoch_us(CAST(ts AS TIMESTAMP)) - prev_us > 1800000000
      |           THEN 1 ELSE 0 END AS is_new
      |    FROM (
      |      SELECT user_id, ts, value, event_id,
      |        lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
      |          PARTITION BY user_id
      |          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
      |      FROM events)))
      |GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin

  /** Bloom-pruned semi join ([[graft.ops.RuntimeFilter]]): revenue of
    * lineitems whose order exceeds a price threshold. The bloom over the
    * qualifying order keys is built as a map-side-partial aggregation,
    * broadcast as ONE row, and probed in the lineitem scan's filter (a
    * codegen-native expression), so non-matching lineitems never reach
    * the semi-join exchange — the explicit form of a runtime filter. Any
    * filter size gives the identical result (false positives die in the
    * exact join), which is what the plain-`IN` oracle certifies.
    */
  def joinBloomPrune(spark: SparkSession, dir: String): DataFrame = {
    val hot = Readers.table(spark, dir, "orders")
      .filter(col("o_totalprice") > 150000.0)
    RuntimeFilter.bloomPrunedSemiJoin(
        Readers.table(spark, dir, "lineitem")
          .select("l_orderkey", "l_returnflag", "l_linestatus",
            "l_extendedprice"),
        col("l_orderkey"),
        hot, col("o_orderkey"),
        numBits = 1L << 20, numHashes = 5)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val joinBloomPruneSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
      |  round(sum(l_extendedprice), 2) AS revenue
      |FROM lineitem
      |WHERE l_orderkey IN (
      |  SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0)
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q7-style bilateral trade volume: revenue shipped between two
    * named nations, by direction and ship year. Plan: the one big join
    * (lineitem ⋈ orders) shuffles once on the order key; supplier and
    * customer shrink to the two nations FIRST and ride in as broadcasts,
    * so the nation filter prunes at the scans, never after the wire.
    */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val nations = Readers.table(spark, dir, "nation")
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select("n_nationkey", "n_name")
    val supp = Readers.table(spark, dir, "supplier")
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Readers.table(spark, dir, "customer")
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Readers.table(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val li = Readers.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), year(col("l_shipdate")).as("l_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
    li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(round(sum("volume"), 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7NationVolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
      |  round(sum(l_extendedprice * (1.0::DOUBLE - l_discount)), 2) AS revenue
      |FROM lineitem, orders, customer, supplier, nation n1, nation n2
      |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND l_suppkey = s_suppkey
      |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |  AND n1.n_name IN ('NATION_1', 'NATION_2')
      |  AND n2.n_name IN ('NATION_1', 'NATION_2')
      |  AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  val Q18MinQty = 250.0

  /** TPC-H Q18-style large-volume orders: orders whose total lineitem
    * quantity exceeds the threshold, with their customer. The HAVING
    * aggregation reduces lineitem to order grain BEFORE any join — the
    * qualifying-order set is tiny, so the customer/order joins run over
    * hundreds of rows, not the fact table; top-100 by a TakeOrdered.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Readers.table(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("sum_qty"))
      .filter(col("sum_qty") > Q18MinQty)
    val ord = Readers.table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Readers.table(spark, dir, "customer").select("c_custkey", "c_name")
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18LargeOrdersSql: String =
    s"""SELECT c_name, c_custkey, o_orderkey,
       |  round(o_totalprice, 2) AS o_totalprice, sum_qty
       |FROM (
       |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
       |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > $Q18MinQty
       |), orders, customer
       |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q16-style supplier diversity: per (brand, type-prefix), how
    * many DISTINCT suppliers shipped the part — excluding suppliers with
    * any negative account balance (the "complaints" anti-set). Exercises
    * the anti-subquery + count(distinct) pair: the exclusion is a
    * broadcast anti-join BEFORE the distinct aggregation, so excluded
    * suppliers never enter the shuffle.
    */
  def q16SupplierDiversity(spark: SparkSession, dir: String): DataFrame = {
    val bad = Readers.table(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0.0).select("s_suppkey")
    val li = Readers.table(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey")
      .join(broadcast(bad), col("l_suppkey") === bad("s_suppkey"),
        "left_anti")
    val part = Readers.table(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"),
        substring(col("p_type"), 1, 6).as("p_type_prefix"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type_prefix")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type_prefix"))
  }

  val q16SupplierDiversitySql: String =
    """SELECT p_brand, substr(p_type, 1, 6) AS p_type_prefix,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_suppkey NOT IN (
      |  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type_prefix
      |ORDER BY supplier_cnt DESC, p_brand, p_type_prefix""".stripMargin

  /** TPC-H Q6-style forecast revenue: the pure scan-side query — a year
    * of shipments in a narrow discount band under a quantity cap, one
    * global sum. Plan shape: ALL three predicates push into the parquet
    * scan (`PushedFilters` carries the shipdate range, discount band and
    * quantity cap, so row groups outside the year prune on statistics),
    * the projection reads only the four referenced columns, and the only
    * exchange is the single-row partial→final aggregate. At 100 TB this
    * is the query whose cost is decided entirely by scan pruning — there
    * is nothing to join and nothing to spill.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Readers.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  val q6ForecastRevenueSql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05::DOUBLE AND 0.07::DOUBLE
      |  AND l_quantity < 24.0::DOUBLE""".stripMargin

  /** TPC-H Q8-style national market share: of the PROMO-part volume sold
    * to EUROPE-region customers over two years, what fraction came from
    * NATION_3 suppliers, per order year. The two-level aggregate (a
    * conditional sum over the same rows as the total) is ONE aggregate
    * with two accumulators — never two passes. Plan: part shrinks to the
    * PROMO keys and broadcasts, supplier carries its nation name in as a
    * broadcast, the region→nation→customer chain folds into a broadcast
    * customer key set, and the single shuffle is lineitem ⋈ orders on the
    * order key (the date filter pushed into the orders scan first).
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val eur = Readers.table(spark, dir, "region")
      .filter(col("r_name") === "EUROPE").select("r_regionkey")
    val natC = Readers.table(spark, dir, "nation")
      .join(broadcast(eur), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val cust = Readers.table(spark, dir, "customer")
      .join(broadcast(natC), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supp = Readers.table(spark, dir, "supplier")
      .join(broadcast(Readers.table(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val promo = Readers.table(spark, dir, "part")
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val ord = Readers.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val li = Readers.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("volume"))
    li.join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("o_year")
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", col("volume"))
          .otherwise(lit(0.0))) / sum(col("volume")), 4).as("mkt_share"))
      .orderBy("o_year")
  }

  val q8MarketShareSql: String =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  round(sum(CASE WHEN n1.n_name = 'NATION_3'
      |                 THEN l_extendedprice * (1.0::DOUBLE - l_discount)
      |                 ELSE 0.0::DOUBLE END)
      |        / sum(l_extendedprice * (1.0::DOUBLE - l_discount)), 4)
      |    AS mkt_share
      |FROM lineitem, orders, customer, supplier, part,
      |     nation n1, nation n2, region
      |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
      |  AND s_nationkey = n1.n_nationkey
      |  AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE' AND p_type = 'PROMO'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1 ORDER BY o_year""".stripMargin

  /** TPC-H Q9-style product-line profit by nation and year. The testdata
    * has no partsupp table, so supply cost is re-expressed off the part
    * dimension (`p_retailprice * l_quantity` in place of
    * `ps_supplycost * l_quantity` — same expression shape, same join
    * arity minus the partsupp branch). The LIKE predicate on part name
    * prunes the part side BEFORE its broadcast; the one shuffle is
    * lineitem ⋈ orders on the order key; profit is computed row-wise
    * inside the scan projection so the aggregate sees one double.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Readers.table(spark, dir, "part")
      .filter(col("p_name").like("%red%"))
      .select("p_partkey", "p_retailprice")
    val supp = Readers.table(spark, dir, "supplier")
      .join(broadcast(Readers.table(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val ord = Readers.table(spark, dir, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val li = Readers.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    li.join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("nation", "o_year")
      .agg(round(sum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          - col("p_retailprice") * col("l_quantity")), 2).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProductProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  round(sum(l_extendedprice * (1.0::DOUBLE - l_discount)
      |            - p_retailprice * l_quantity), 2) AS sum_profit
      |FROM lineitem, orders, part, supplier, nation
      |WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      |  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q10-style returned-item ranking: top-20 customers by revenue
    * lost to returns in one quarter. Plan shape: both filters push into
    * their scans, lineitem ⋈ orders shuffles on the order key, the
    * aggregate reduces to customer grain BEFORE the customer join (the
    * joined left side is thousands of rows, so at 100 TB the
    * customer-dimension join shuffles two SMALL-by-construction sides on
    * the customer key — never broadcast-sized fact state), nation rides
    * in as a broadcast, and the 20-row cut is a TakeOrdered over ROUNDED
    * revenue with the customer key as tiebreak (round-then-rank keeps
    * the kept set engine-stable, as in Q3).
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val ord = Readers.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Readers.table(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("volume"))
    val cust = Readers.table(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val nat = Readers.table(spark, dir, "nation")
      .select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(round(sum(col("volume")), 2).as("revenue"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnedItemsSql: String =
    """SELECT c_custkey, c_name, revenue,
      |  round(c_acctbal, 2) AS c_acctbal, n_name
      |FROM (
      |  SELECT o_custkey,
      |    round(sum(l_extendedprice * (1.0::DOUBLE - l_discount)), 2)
      |      AS revenue
      |  FROM lineitem, orders
      |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      |    AND o_orderdate >= TIMESTAMP '1996-10-01'
      |    AND o_orderdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1
      |), customer, nation
      |WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q12-style priority line counts (the testdata has no
    * `l_shipmode`, so the line-status flag stands in as the grouping
    * dimension — the certified shape is the conditional two-accumulator
    * aggregate after the fact-fact join). Counts are integral, so the
    * cross-engine compare is exact in any summation order. Plan: the
    * ship-year filter pushes into the lineitem scan, the join shuffles
    * once on the order key, and both CASE counts fold into one partial
    * aggregate map-side.
    */
  def q12PriorityLines(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Seq("1-URGENT", "2-HIGH")
    val ord = Readers.table(spark, dir, "orders")
      .select("o_orderkey", "o_orderpriority")
    val li = Readers.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linestatus")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin(urgent: _*), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin(urgent: _*), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val q12PriorityLinesSql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem, orders
      |WHERE l_orderkey = o_orderkey
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q14-style promo effect: the percentage of one month's revenue
    * that came from PROMO-type parts — the classic conditional-sum ratio.
    * Plan: the month filter pushes into the lineitem scan (one month of
    * a fact table prunes to a sliver on row-group statistics), part
    * broadcasts carrying only the key and type, and the ratio's two sums
    * are a single two-accumulator aggregate — one pass, one exchange,
    * one output row.
    */
  def q14PromoEffect(spark: SparkSession, dir: String): DataFrame = {
    val part = Readers.table(spark, dir, "part")
      .select("p_partkey", "p_type")
    val li = Readers.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_partkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("volume"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", col("volume"))
          .otherwise(lit(0.0))) / sum(col("volume")), 4)
        .as("promo_revenue"))
  }

  val q14PromoEffectSql: String =
    """SELECT round(100.0::DOUBLE *
      |    sum(CASE WHEN p_type = 'PROMO'
      |        THEN l_extendedprice * (1.0::DOUBLE - l_discount)
      |        ELSE 0.0::DOUBLE END)
      |    / sum(l_extendedprice * (1.0::DOUBLE - l_discount)), 4)
      |  AS promo_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-03-01'
      |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_pricing_summary" -> aggPricingSummary,
    "q6_forecast_revenue" -> q6ForecastRevenue,
    "q8_market_share" -> q8MarketShare,
    "q9_product_profit" -> q9ProductProfit,
    "q10_returned_items" -> q10ReturnedItems,
    "q12_priority_lines" -> q12PriorityLines,
    "q14_promo_effect" -> q14PromoEffect,
    "join_bloom_prune" -> joinBloomPrune,
    "q7_nation_volume" -> q7NationVolume,
    "q16_supplier_diversity" -> q16SupplierDiversity,
    "q18_large_orders" -> q18LargeOrders,
    "agg_rollup" -> aggRollup,
    "topk_orders" -> topkOrders,
    "window_rank" -> windowRank,
    "window_running" -> windowRunning,
    "window_rank_skewfree" -> windowRankSkewfree,
    "window_running_skewfree" -> windowRunningSkewfree,
    "agg_distinct" -> aggDistinct,
    "set_ops" -> setOps,
    "join_salted" -> joinSalted,
    "json_extract" -> jsonExtract,
    "map_ops" -> mapOps,
    "array_ops" -> arrayOps,
    "tumbling_window" -> tumblingWindow,
    "sessionize" -> sessionizeQ,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q5_local_supplier" -> q5LocalSupplier
  )

  val oracle: Map[String, String] = Map(
    "agg_pricing_summary" -> aggPricingSummarySql,
    "q6_forecast_revenue" -> q6ForecastRevenueSql,
    "q8_market_share" -> q8MarketShareSql,
    "q9_product_profit" -> q9ProductProfitSql,
    "q10_returned_items" -> q10ReturnedItemsSql,
    "q12_priority_lines" -> q12PriorityLinesSql,
    "q14_promo_effect" -> q14PromoEffectSql,
    "join_bloom_prune" -> joinBloomPruneSql,
    "q7_nation_volume" -> q7NationVolumeSql,
    "q16_supplier_diversity" -> q16SupplierDiversitySql,
    "q18_large_orders" -> q18LargeOrdersSql,
    "agg_rollup" -> aggRollupSql,
    "topk_orders" -> topkOrdersSql,
    "window_rank" -> windowRankSql,
    "window_running" -> windowRunningSql,
    "window_rank_skewfree" -> windowRankSkewfreeSql,
    "window_running_skewfree" -> windowRunningSkewfreeSql,
    "agg_distinct" -> aggDistinctSql,
    "set_ops" -> setOpsSql,
    "join_salted" -> joinSaltedSql,
    "json_extract" -> jsonExtractSql,
    "map_ops" -> mapOpsSql,
    "array_ops" -> arrayOpsSql,
    "tumbling_window" -> tumblingWindowSql,
    "sessionize" -> sessionizeSql,
    "q3_shipping_priority" -> q3ShippingPrioritySql,
    "q5_local_supplier" -> q5LocalSupplierSql
  )
}

package graft.queries

import graft.etl.Readers
import graft.ops.Quality
import graft.ops.Quality.RowCheck
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse reliability queries: the data-quality suite over the TPC-H-ish
  * tables and a CDC upsert of an orders-derived change feed into customer.
  * Oracles spell the identical checks/merge in portable SQL.
  */
object QualityQueries {

  val OrderStatuses = Seq("F", "O", "P")

  /** Full DQ suite: row-level checks ride one aggregate pass per table;
    * uniqueness and referential integrity use their own minimal shapes.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val orders   = Readers.table(spark, dir, "orders")
    val lineitem = Readers.table(spark, dir, "lineitem")
    val customer = Readers.table(spark, dir, "customer")
    val results = Seq(
      Quality.rowChecks(orders, Seq(
        RowCheck("orders_custkey_not_null", col("o_custkey").isNull),
        RowCheck("orders_status_accepted",
          !col("o_orderstatus").isin(OrderStatuses: _*)),
        RowCheck("orders_totalprice_positive", col("o_totalprice") <= 0.0))),
      Quality.rowChecks(lineitem, Seq(
        RowCheck("lineitem_discount_range",
          col("l_discount") < 0.0 || col("l_discount") > 1.0),
        RowCheck("lineitem_quantity_positive", col("l_quantity") <= 0.0),
        RowCheck("lineitem_tax_nonnegative", col("l_tax") < 0.0))),
      Quality.uniquenessCheck(orders, "orders_orderkey_unique",
        Seq(col("o_orderkey"))),
      Quality.uniquenessCheck(lineitem, "lineitem_line_unique",
        Seq(col("l_orderkey"), col("l_linenumber"))),
      Quality.referentialCheck(lineitem, col("l_orderkey"),
        orders, col("o_orderkey"), "lineitem_orderkey_fk"),
      Quality.referentialCheck(orders, col("o_custkey"),
        customer, col("c_custkey"), "orders_custkey_fk"))
    Quality.suite(results).orderBy("check_name")
  }

  val dqChecksSql: String = {
    val statuses = OrderStatuses.map(s => s"'$s'").mkString(", ")
    def row(name: String, table: String, fails: String) =
      s"""SELECT '$name' AS check_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN $fails THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
         |  sum(CASE WHEN $fails THEN 1 ELSE 0 END) = 0 AS pass
         |FROM $table""".stripMargin
    def uniq(name: String, table: String, keys: String) =
      s"""SELECT '$name' AS check_name, CAST(sum(n) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_failed,
         |  sum(CASE WHEN n > 1 THEN n ELSE 0 END) = 0 AS pass
         |FROM (SELECT count(*) AS n FROM $table GROUP BY $keys)""".stripMargin
    def fk(name: String, child: String, ck: String, parent: String, pk: String) =
      s"""SELECT '$name' AS check_name,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_rows,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $child
         |    WHERE $ck NOT IN (SELECT $pk FROM $parent)) AS n_failed,
         |  (SELECT count(*) FROM $child
         |    WHERE $ck NOT IN (SELECT $pk FROM $parent)) = 0 AS pass""".stripMargin
    Seq(
      row("orders_custkey_not_null", "orders", "o_custkey IS NULL"),
      row("orders_status_accepted", "orders",
        s"o_orderstatus NOT IN ($statuses)"),
      row("orders_totalprice_positive", "orders", "o_totalprice <= 0.0"),
      row("lineitem_discount_range", "lineitem",
        "l_discount < 0.0 OR l_discount > 1.0"),
      row("lineitem_quantity_positive", "lineitem", "l_quantity <= 0.0"),
      row("lineitem_tax_nonnegative", "lineitem", "l_tax < 0.0"),
      uniq("orders_orderkey_unique", "orders", "o_orderkey"),
      uniq("lineitem_line_unique", "lineitem", "l_orderkey, l_linenumber"),
      fk("lineitem_orderkey_fk", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      fk("orders_custkey_fk", "orders", "o_custkey", "customer", "c_custkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY check_name")
  }

  /** The deterministic change feed for the upsert demo, derived purely from
    * `orders`: per customer the LATEST order (o_orderdate desc, o_orderkey
    * desc) proposes a new account balance; orders whose key is ≡0 mod 101
    * additionally propose an INSERT at key `o_custkey + 10_000_000` (a
    * range no base customer occupies).
    */
  def changeFeed(orders: DataFrame): DataFrame = {
    val updates = orders.select(
      col("o_custkey").as("c_custkey"),
      round(col("o_totalprice"), 2).as("c_acctbal"),
      col("o_orderdate"), col("o_orderkey"))
    val inserts = orders.filter(col("o_orderkey") % 101 === 0).select(
      (col("o_custkey") + 10000000L).as("c_custkey"),
      round(col("o_totalprice"), 2).as("c_acctbal"),
      col("o_orderdate"), col("o_orderkey"))
      .withColumn("c_name", concat(lit("NEW#"), col("c_custkey")))
      .withColumn("c_mktsegment", lit("NEW"))
    updates.unionByName(inserts, allowMissingColumns = true)
  }

  /** CDC upsert: the change feed merged into customer. Customers with
    * orders get their latest order's total as the new balance (`update`),
    * untouched customers pass through (`keep`), out-of-range keys append
    * (`insert`).
    */
  def cdcUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Readers.table(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    Quality.upsertLatest(base, changeFeed(Readers.table(spark, dir, "orders")),
        key = "c_custkey",
        versionOrder = Seq(col("o_orderdate").desc, col("o_orderkey").desc),
        payload = Seq("c_name", "c_acctbal", "c_mktsegment"))
      .withColumn("c_acctbal", round(col("c_acctbal"), 2))
      .orderBy("c_custkey")
  }

  /** Delete-aware MERGE: the same change feed, now carrying an op — a
    * customer whose LATEST order is finished (`o_orderstatus = 'F'`)
    * is a delete; anything else upserts as in [[cdcUpsert]]. The latest
    * change per key decides alone (an older update under a newer delete
    * never applies); deleted keys are absent from the applied table.
    */
  def cdcMergeDelete(spark: SparkSession, dir: String): DataFrame = {
    val base = Readers.table(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val orders = Readers.table(spark, dir, "orders")
    val feed = changeFeed(orders)
      .join(orders.select(col("o_orderkey"),
        when(col("o_orderstatus") === "F", "D").otherwise("U").as("op")),
        Seq("o_orderkey"))
    graft.ops.Quality.mergeCdc(base, feed,
        key = "c_custkey",
        versionOrder = Seq(col("o_orderdate").desc, col("o_orderkey").desc),
        payload = Seq("c_name", "c_acctbal", "c_mktsegment"))
      .withColumn("c_acctbal", round(col("c_acctbal"), 2))
      .orderBy("c_custkey")
  }

  val cdcMergeDeleteSql: String =
    """WITH feed AS (
      |  SELECT o_custkey AS c_custkey, round(o_totalprice, 2) AS c_acctbal,
      |    NULL AS c_name, NULL AS c_mktsegment, o_orderdate, o_orderkey,
      |    CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
      |  FROM orders
      |  UNION ALL
      |  SELECT o_custkey + 10000000 AS c_custkey, round(o_totalprice, 2),
      |    'NEW#' || (o_custkey + 10000000), 'NEW', o_orderdate, o_orderkey,
      |    CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
      |  FROM orders WHERE o_orderkey % 101 = 0
      |),
      |latest AS (
      |  SELECT c_custkey, c_acctbal, c_name, c_mktsegment, op FROM feed
      |  QUALIFY row_number() OVER (PARTITION BY c_custkey
      |    ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
      |),
      |ups AS (SELECT * EXCLUDE (op) FROM latest WHERE op <> 'D'),
      |dels AS (SELECT c_custkey FROM latest WHERE op = 'D'),
      |merged AS (
      |  SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
      |    COALESCE(c.c_name, b.c_name) AS c_name,
      |    round(COALESCE(c.c_acctbal, b.c_acctbal), 2) AS c_acctbal,
      |    COALESCE(c.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
      |    CASE WHEN b.c_custkey IS NOT NULL AND c.c_custkey IS NOT NULL
      |           THEN 'update'
      |         WHEN c.c_custkey IS NOT NULL THEN 'insert'
      |         ELSE 'keep' END AS action
      |  FROM customer b FULL OUTER JOIN ups c ON b.c_custkey = c.c_custkey
      |)
      |SELECT m.* FROM merged m LEFT JOIN dels d USING (c_custkey)
      |WHERE d.c_custkey IS NULL
      |ORDER BY c_custkey""".stripMargin

  val cdcUpsertSql: String =
    """WITH feed AS (
      |  SELECT o_custkey AS c_custkey, round(o_totalprice, 2) AS c_acctbal,
      |    NULL AS c_name, NULL AS c_mktsegment, o_orderdate, o_orderkey
      |  FROM orders
      |  UNION ALL
      |  SELECT o_custkey + 10000000 AS c_custkey, round(o_totalprice, 2),
      |    'NEW#' || (o_custkey + 10000000), 'NEW', o_orderdate, o_orderkey
      |  FROM orders WHERE o_orderkey % 101 = 0
      |),
      |latest AS (
      |  SELECT c_custkey, c_acctbal, c_name, c_mktsegment FROM feed
      |  QUALIFY row_number() OVER (PARTITION BY c_custkey
      |    ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
      |)
      |SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
      |  COALESCE(c.c_name, b.c_name) AS c_name,
      |  round(COALESCE(c.c_acctbal, b.c_acctbal), 2) AS c_acctbal,
      |  COALESCE(c.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
      |  CASE WHEN b.c_custkey IS NOT NULL AND c.c_custkey IS NOT NULL
      |         THEN 'update'
      |       WHEN c.c_custkey IS NOT NULL THEN 'insert'
      |       ELSE 'keep' END AS action
      |FROM customer b FULL OUTER JOIN latest c ON b.c_custkey = c.c_custkey
      |ORDER BY 1""".stripMargin

  /** The deterministic "migrated copy" of customer the diff runs against:
    * keys ≡0 mod 97 dropped, balances bumped for ≡0 mod 7, segment
    * rewritten for ≡0 mod 13, extra rows appended at key+10M for ≡0 mod
    * 101 — every metric the reconciliation reports is exercised.
    */
  def mutatedCustomer(customer: DataFrame): DataFrame = {
    val kept = customer.filter(col("c_custkey") % 97 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 10.0)
          .otherwise(col("c_acctbal")))
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 13 === 0, lit("MOVED"))
          .otherwise(col("c_mktsegment")))
    val extra = customer.filter(col("c_custkey") % 101 === 0)
      .withColumn("c_custkey", col("c_custkey") + 10000000L)
    kept.unionByName(extra)
  }

  /** Reconciliation of customer against its mutated twin: one full-outer
    * pass, metric rows out.
    */
  def tableDiff(spark: SparkSession, dir: String): DataFrame = {
    val customer = Readers.table(spark, dir, "customer")
    Quality.tableDiff(customer, mutatedCustomer(customer), "c_custkey",
        Seq("c_name", "c_acctbal", "c_mktsegment"))
      .orderBy("metric")
  }

  val tableDiffSql: String =
    """WITH r AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0
      |         ELSE c_acctbal END AS c_acctbal,
      |    CASE WHEN c_custkey % 13 = 0 THEN 'MOVED'
      |         ELSE c_mktsegment END AS c_mktsegment,
      |    c_name
      |  FROM customer WHERE c_custkey % 97 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, c_acctbal, c_mktsegment, c_name
      |  FROM customer WHERE c_custkey % 101 = 0
      |),
      |j AS (
      |  SELECT l.c_custkey IS NOT NULL AS lp, r.c_custkey IS NOT NULL AS rp,
      |    l.c_name AS ln, r.c_name AS rn,
      |    l.c_acctbal AS lb, r.c_acctbal AS rb,
      |    l.c_mktsegment AS lm, r.c_mktsegment AS rm
      |  FROM customer l FULL OUTER JOIN r ON l.c_custkey = r.c_custkey
      |),
      |s AS (
      |  SELECT
      |    sum(CASE WHEN lp AND NOT rp THEN 1 ELSE 0 END) AS only_left,
      |    sum(CASE WHEN rp AND NOT lp THEN 1 ELSE 0 END) AS only_right,
      |    sum(CASE WHEN lp AND rp THEN 1 ELSE 0 END) AS n_common,
      |    sum(CASE WHEN lp AND rp AND ln IS DISTINCT FROM rn
      |        THEN 1 ELSE 0 END) AS diff_c_name,
      |    sum(CASE WHEN lp AND rp AND lb IS DISTINCT FROM rb
      |        THEN 1 ELSE 0 END) AS diff_c_acctbal,
      |    sum(CASE WHEN lp AND rp AND lm IS DISTINCT FROM rm
      |        THEN 1 ELSE 0 END) AS diff_c_mktsegment
      |  FROM j
      |)
      |SELECT metric, CAST(n AS BIGINT) AS n FROM (
      |  SELECT 'only_left' AS metric, only_left AS n FROM s
      |  UNION ALL SELECT 'only_right', only_right FROM s
      |  UNION ALL SELECT 'n_common', n_common FROM s
      |  UNION ALL SELECT 'diff_c_name', diff_c_name FROM s
      |  UNION ALL SELECT 'diff_c_acctbal', diff_c_acctbal FROM s
      |  UNION ALL SELECT 'diff_c_mktsegment', diff_c_mktsegment FROM s
      |) ORDER BY metric""".stripMargin

  val DigestBuckets = 16

  /** Merkle-style replica reconciliation: both "replicas" of orders (the
    * second with one row deliberately mutated) reduce to per-bucket
    * XOR-of-row-digests, and the comparison is a join of two
    * 16-row summaries — finding WHICH buckets differ in a 100 TB table
    * costs two scans plus a constant-size exchange, instead of a
    * row-by-row anti-join of replicas. XOR makes the bucket digest
    * order-independent (any partitioning, any merge order) and
    * incrementally maintainable (a changed row XORs out its old digest
    * and in its new one). The row digest hashes a canonical string of
    * the row through md5, so both engines agree bit-for-bit; the bucket
    * is the join key's hash — co-located with how the table would
    * actually be bucketed on disk.
    */
  def bucketDigest(spark: SparkSession, dir: String): DataFrame = {
    def digests(mutated: Boolean): DataFrame = {
      val o = Readers.table(spark, dir, "orders")
      val status =
        if (mutated)
          when(col("o_orderkey") === 7L, lit("X")).otherwise(col("o_orderstatus"))
        else col("o_orderstatus")
      o.select((col("o_orderkey") % DigestBuckets).as("bucket"),
          conv(substring(md5(concat_ws("|",
            col("o_orderkey"), status, col("o_orderpriority"),
            unix_micros(col("o_orderdate").cast("timestamp")))), 1, 15), 16, 10)
            .cast("long").as("d"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(d)").as("digest"))
    }
    val a = digests(mutated = false)
    val b = digests(mutated = true)
      .select(col("bucket"), col("n_rows").as("n_rows_b"),
        col("digest").as("digest_b"))
    a.join(b, Seq("bucket"))
      .select(col("bucket"), col("n_rows"), col("digest"),
        (col("digest") === col("digest_b") &&
          col("n_rows") === col("n_rows_b")).as("is_match"))
      .orderBy("bucket")
  }

  val bucketDigestSql: String =
    s"""WITH a AS (
       |  SELECT o_orderkey % $DigestBuckets AS bucket,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    bit_xor(('0x' || substr(md5(
       |      o_orderkey::VARCHAR || '|' || o_orderstatus || '|' ||
       |      o_orderpriority || '|' || epoch_us(o_orderdate)::VARCHAR
       |    ), 1, 15))::BIGINT) AS digest
       |  FROM orders GROUP BY 1
       |), b AS (
       |  SELECT o_orderkey % $DigestBuckets AS bucket,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    bit_xor(('0x' || substr(md5(
       |      o_orderkey::VARCHAR || '|' ||
       |      CASE WHEN o_orderkey = 7 THEN 'X' ELSE o_orderstatus END
       |      || '|' || o_orderpriority || '|' || epoch_us(o_orderdate)::VARCHAR
       |    ), 1, 15))::BIGINT) AS digest
       |  FROM orders GROUP BY 1
       |)
       |SELECT a.bucket, a.n_rows, a.digest,
       |  (a.digest = b.digest AND a.n_rows = b.n_rows) AS is_match
       |FROM a JOIN b USING (bucket)
       |ORDER BY bucket""".stripMargin


  /** Join fan-out audit — the skew diagnosis that DECIDES between a plain
    * shuffle join, a broadcast, and the salted join: for each join key,
    * the row count, key cardinality, and the max/avg/p99 rows-per-key
    * multiplicities. A p99≪max profile is the hot-key signature that
    * makes `join_salted`'s salting worth its replication; flat profiles
    * make it pure overhead. One hash aggregate per audited key.
    */
  def joinFanoutAudit(spark: SparkSession, dir: String): DataFrame = {
    def profile(df: DataFrame, key: String, label: String): DataFrame =
      df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(col("cnt")).as("max_fanout"),
          round(avg(col("cnt")), 4).as("avg_fanout"),
          round(expr("percentile(cnt, 0.99D)"), 4).as("p99_fanout"))
        .select(lit(label).as("join_key"), col("n_rows"), col("n_keys"),
          col("max_fanout"), col("avg_fanout"), col("p99_fanout"))
    profile(Readers.table(spark, dir, "lineitem"), "l_orderkey",
        "lineitem.l_orderkey")
      .unionAll(profile(Readers.table(spark, dir, "orders"), "o_custkey",
        "orders.o_custkey"))
      .unionAll(profile(Readers.events(spark, dir), "user_id",
        "events.user_id"))
      .orderBy("join_key")
  }

  val joinFanoutAuditSql: String = {
    def one(table: String, key: String) =
      s"""SELECT '$table.$key' AS join_key,
         |  CAST(sum(cnt) AS BIGINT) AS n_rows,
         |  CAST(count(*) AS BIGINT) AS n_keys,
         |  max(cnt) AS max_fanout,
         |  round(avg(cnt), 4) AS avg_fanout,
         |  round(quantile_cont(cnt, 0.99), 4) AS p99_fanout
         |FROM (SELECT CAST(count(*) AS BIGINT) AS cnt
         |      FROM $table GROUP BY $key)""".stripMargin
    Seq(one("lineitem", "l_orderkey"), one("orders", "o_custkey"),
      one("events", "user_id"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY join_key")
  }


  /** Column-level lineage of the flagship pipeline, derived from the
    * ANALYZED Catalyst plan ([[graft.plans.Lineage]]) — the governance
    * artifact (impact analysis, PII audit) extracted from the same tree
    * the optimizer consumes, so it can never drift from the code. The
    * oracle pins the expected column → source mapping as literals: a
    * refactor that silently changes what feeds an output column fails
    * the compare.
    */
  def columnLineageQ(spark: SparkSession, dir: String): DataFrame = {
    val rows = graft.plans.Lineage
      .columnLineage(Core.denormalizedFlagship(spark, dir))
      .map { case (o, s) => (o, s.mkString(",")) }
    spark.createDataFrame(rows).toDF("out_col", "sources")
      .orderBy("out_col")
  }

  val columnLineageSql: String = Seq(
    ("c_mktsegment", "customer.c_mktsegment"),
    ("c_name", "customer.c_name"),
    ("event_id", "events.event_id"),
    ("event_type", "events.event_type"),
    ("k", "events.props"),
    ("ts", "events.ts"),
    ("user_id", "events.user_id"),
    ("value", "events.value"),
    ("value_scaled", "events.value"))
    .map { case (o, src) => s"SELECT '$o' AS out_col, '$src' AS sources" }
    .mkString("", "\nUNION ALL\n", "\nORDER BY out_col")


  /** GDPR deletion-propagation plan: given the forget-set (customers with
    * key ≡ 0 mod 97 — the deterministic stand-in for a deletion-request
    * feed), size the cascade across the referential graph BEFORE running
    * it: orders of those customers, lineitems of those orders, events of
    * those users. Each table is one scan with a broadcast semi-probe of
    * the (tiny) doomed-key set — the plan a deletion job would execute,
    * priced without executing it. Pairs with [[columnLineageQ]]: lineage
    * says where PII flows, this says what forgetting it costs.
    */
  def cascadeDeletePlan(spark: SparkSession, dir: String): DataFrame = {
    def audit(df: DataFrame, key: String, ids: DataFrame,
              label: String): DataFrame =
      df.join(broadcast(ids.distinct().withColumnRenamed("id", "__did")),
          col(key) === col("__did"), "left")
        .agg(count(lit(1)).as("n_total"), count(col("__did")).as("n_delete"))
        .select(lit(label).as("table_name"), col("n_total"), col("n_delete"),
          round(col("n_delete") / col("n_total").cast("double"), 6).as("frac"))
    val doomed = Readers.table(spark, dir, "customer")
      .filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("id"))
    val doomedOrders = Readers.table(spark, dir, "orders")
      .join(broadcast(doomed), col("o_custkey") === col("id"), "left_semi")
      .select(col("o_orderkey").as("id"))
    audit(Readers.table(spark, dir, "customer"), "c_custkey", doomed,
        "customer")
      .unionAll(audit(Readers.table(spark, dir, "events"), "user_id", doomed,
        "events"))
      .unionAll(audit(Readers.table(spark, dir, "lineitem"), "l_orderkey",
        doomedOrders, "lineitem"))
      .unionAll(audit(Readers.table(spark, dir, "orders"), "o_custkey", doomed,
        "orders"))
      .orderBy("table_name")
  }

  val cascadeDeletePlanSql: String =
    """WITH doomed AS (
      |  SELECT c_custkey AS id FROM customer WHERE c_custkey % 97 = 0
      |), doomed_orders AS (
      |  SELECT o_orderkey AS id FROM orders
      |  WHERE o_custkey IN (SELECT id FROM doomed)
      |), rows_ AS (
      |  SELECT 'customer' AS table_name,
      |    (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_total,
      |    (SELECT CAST(count(*) AS BIGINT) FROM customer
      |     WHERE c_custkey IN (SELECT id FROM doomed)) AS n_delete
      |  UNION ALL
      |  SELECT 'events',
      |    (SELECT count(*) FROM events),
      |    (SELECT count(*) FROM events
      |     WHERE user_id IN (SELECT id FROM doomed))
      |  UNION ALL
      |  SELECT 'lineitem',
      |    (SELECT count(*) FROM lineitem),
      |    (SELECT count(*) FROM lineitem
      |     WHERE l_orderkey IN (SELECT id FROM doomed_orders))
      |  UNION ALL
      |  SELECT 'orders',
      |    (SELECT count(*) FROM orders),
      |    (SELECT count(*) FROM orders
      |     WHERE o_custkey IN (SELECT id FROM doomed))
      |)
      |SELECT table_name, n_total, n_delete,
      |  round(n_delete / n_total::DOUBLE, 6) AS frac
      |FROM rows_ ORDER BY table_name""".stripMargin


  /** The crawl-ingest contract end to end: documents serialized to JSONL
    * with deliberately corrupt lines interleaved (every 50th doc id),
    * read back through the PERMISSIVE quarantine reader
    * ([[graft.etl.Readers.jsonlQuarantine]]) — malformed lines survive the
    * scan as `_corrupt_record` rows instead of failing the job or
    * silently vanishing, and the aggregate proves none were lost OR
    * double-counted. The write at construction is the same
    * demonstrates-its-own-layout pattern as `bucketed_join`.
    */
  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val docs = Readers.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        length(col("text")).cast(IntegerType).as("n_chars"))
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_rt_" +
      Integer.toHexString(dir.hashCode)
    val good = docs.select(to_json(struct(col("doc_id"), col("source"),
      col("n_chars"))).as("value"))
    val corrupt = docs.filter(col("doc_id") % 50 === 0)
      .select(concat(lit("{corrupt "), col("doc_id")).as("value"))
    good.unionAll(corrupt).coalesce(1)
      .write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("n_chars", IntegerType)))
    Readers.jsonlQuarantine(spark, out, schema)
      .agg(count(lit(1)).as("n_rows"),
        count(col("_corrupt_record")).as("n_corrupt"),
        count(col("doc_id")).as("n_good"),
        sum(col("n_chars")).cast("long").as("chars_total"),
        countDistinct(col("source")).as("n_sources"))
  }

  val jsonlRoundtripSql: String =
    """SELECT
      |  CAST(count(*) + sum(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_corrupt,
      |  CAST(count(*) AS BIGINT) AS n_good,
      |  CAST(sum(length(text)) AS BIGINT) AS chars_total,
      |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "jsonl_roundtrip" -> jsonlRoundtrip,
    "column_lineage" -> columnLineageQ,
    "cascade_delete_plan" -> cascadeDeletePlan,
    "join_fanout_audit" -> joinFanoutAudit,
    "bucket_digest" -> bucketDigest,
    "dq_checks" -> dqChecks,
    "cdc_upsert" -> cdcUpsert,
    "cdc_merge_delete" -> cdcMergeDelete,
    "table_diff" -> tableDiff)

  val oracle: Map[String, String] = Map(
    "jsonl_roundtrip" -> jsonlRoundtripSql,
    "column_lineage" -> columnLineageSql,
    "cascade_delete_plan" -> cascadeDeletePlanSql,
    "join_fanout_audit" -> joinFanoutAuditSql,
    "bucket_digest" -> bucketDigestSql,
    "dq_checks" -> dqChecksSql,
    "cdc_upsert" -> cdcUpsertSql,
    "cdc_merge_delete" -> cdcMergeDeleteSql,
    "table_diff" -> tableDiffSql)
}

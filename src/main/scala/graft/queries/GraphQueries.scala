package graft.queries

import graft.etl.Readers
import graft.ops.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics queries. The customer↔supplier bipartite graph comes
  * from who-bought-from-whom (orders ⋈ lineitem), symmetrized so PageRank
  * has no sinks; node ids are prefixed ('c'/'s') so the two key spaces
  * never collide. The oracle unrolls the same three damped iterations as
  * chained CTEs — identical math, identical join shape.
  */
object GraphQueries {

  val Iterations = 3
  val Damping = 0.85

  /** Who-bought-from-whom edges, symmetric: c<k> ↔ s<k>. Node ids stay
    * NUMERIC through the whole computation (customer 2k, supplier 2k+1 —
    * disjoint by parity): the distinct shuffles long pairs instead of
    * freshly-concatenated strings, and every iteration joins/aggregates on
    * long keys. The display label is built once, on the |V|-sized output.
    */
  def tradeEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pairs = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey"))
      .select((col("o_custkey") * 2L).as("src"),
        (col("l_suppkey") * 2L + 1L).as("dst"))
      .distinct()
    pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  def pagerank(spark: SparkSession, dir: String): DataFrame =
    Graph.pageRank(
        tradeEdges(Readers.table(spark, dir, "orders"),
          Readers.table(spark, dir, "lineitem")),
        Iterations, Damping)
      .select(
        when(col("node") % 2L === 0L, concat(lit("c"), expr("node DIV 2")))
          .otherwise(concat(lit("s"), expr("(node - 1) DIV 2")))
          .as("node"),
        round(col("rank"), 8).as("rank_r"))
      .orderBy("node")

  val pagerankSql: String = {
    def iter(k: Int): String =
      s"""r$k AS (
         |  SELECT n.node,
         |    ${1 - Damping}::DOUBLE / c.n +
         |    $Damping::DOUBLE * COALESCE(s.inflow, 0.0::DOUBLE) AS rank
         |  FROM nodes n CROSS JOIN cnt c
         |  LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank / d.outdeg) AS inflow
         |    FROM edges e
         |    JOIN r${k - 1} r ON e.src = r.node
         |    JOIN deg d ON d.node = e.src
         |    GROUP BY e.dst
         |  ) s ON s.node = n.node
         |)""".stripMargin
    s"""WITH p AS (
       |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |),
       |edges AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |cnt AS (SELECT count(*)::DOUBLE AS n FROM nodes),
       |deg AS (SELECT src AS node, count(*)::DOUBLE AS outdeg
       |        FROM edges GROUP BY 1),
       |r0 AS (SELECT node, 1.0::DOUBLE / n AS rank FROM nodes CROSS JOIN cnt),
       |${(1 to Iterations).map(iter).mkString(",\n")}
       |SELECT node, round(rank, 8) AS rank_r FROM r$Iterations
       |ORDER BY node""".stripMargin
  }

  /** Vertex-sample denominator: keep parts with md5-bucket 0 of
    * `TriSample` (a deterministic 1/`TriSample` vertex sample).
    */
  val TriSample = 10

  /** Triangle counts on the part co-purchase graph (parts adjacent when
    * some order contains both), over a deterministic 10% md5 vertex
    * sample — the Doulion-style estimator: a triangle survives vertex
    * sampling with probability p³, so `T ≈ T_sampled/p³` with variance
    * that vanishes at scale. The sample is the 100 TB answer to this
    * graph's densification (a fixed part-key space saturates toward a
    * complete graph as orders accumulate: measured 1.2M edges at sf0.1
    * vs 116k at sf0.01 over the same 20k/2k parts — exact counting cost
    * grows as E^1.5 while the p=0.1 sampled subgraph stays ~1% of E).
    * Per-order pair expansion is bounded by order size (≤7 lineitems);
    * the counting itself is [[Graph.triangles]]'s degree-ordered wedge
    * join, which never blows up on hub parts. Sampling by md5 keeps the
    * subgraph — and therefore every count — engine-reproducible.
    */
  def triangleCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = Readers.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("g"), col("l_partkey").as("p"))
      .filter(graft.ops.Sampling.hashBucket(col("p"), TriSample) === 0)
    val pairs = li.as("r1").join(li.as("r2"),
        col("r1.g") === col("r2.g") && col("r1.p") < col("r2.p"))
      .select(col("r1.p").as("src"), col("r2.p").as("dst"))
    Graph.triangles(pairs)
      .select(col("node").as("part"), col("n_tri"))
      .orderBy("part")
  }

  val triangleCountsSql: String =
    s"""WITH raw AS (
      |  SELECT l_orderkey AS g, l_partkey AS p FROM lineitem
      |  WHERE ('0x' || substr(md5(l_partkey::VARCHAR), 1, 8))::BIGINT
      |        % $TriSample = 0
      |),
      |e AS (
      |  SELECT DISTINCT r1.p AS a, r2.p AS b
      |  FROM raw r1 JOIN raw r2 ON r1.g = r2.g AND r1.p < r2.p
      |),
      |deg AS (
      |  SELECT node, count(*) AS d FROM (
      |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
      |  GROUP BY node
      |),
      |o AS (
      |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
      |              THEN e.a ELSE e.b END AS u,
      |         CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
      |              THEN e.b ELSE e.a END AS v,
      |         CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
      |              THEN db.d ELSE da.d END AS vd
      |  FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
      |),
      |t AS (
      |  SELECT o1.u AS x, o1.v AS y, o2.v AS z
      |  FROM o o1 JOIN o o2 ON o1.u = o2.u
      |    AND (o1.vd < o2.vd OR (o1.vd = o2.vd AND o1.v < o2.v))
      |  JOIN o o3 ON o3.u = o1.v AND o3.v = o2.v
      |)
      |SELECT node AS part, CAST(count(*) AS BIGINT) AS n_tri
      |FROM (SELECT x AS node FROM t
      |      UNION ALL SELECT y FROM t
      |      UNION ALL SELECT z FROM t)
      |GROUP BY node ORDER BY part""".stripMargin

  val LpaIterations = 3

  /** Community labels on the trade graph after `LpaIterations` sync LPA
    * rounds ([[Graph.labelPropagation]]); numeric parity ids throughout,
    * display prefix applied only on the |V|-sized output, exactly as
    * [[pagerank]] does. The oracle unrolls the identical rounds as CTEs
    * with the same (count desc, label asc) argmax.
    */
  def lpaCommunities(spark: SparkSession, dir: String): DataFrame = {
    Graph.labelPropagation(
        tradeEdges(Readers.table(spark, dir, "orders"),
          Readers.table(spark, dir, "lineitem")),
        LpaIterations)
      .select(
        when(col("node") % 2L === 0L, concat(lit("c"), expr("node DIV 2")))
          .otherwise(concat(lit("s"), expr("(node - 1) DIV 2"))).as("node"),
        when(col("label") % 2L === 0L, concat(lit("c"), expr("label DIV 2")))
          .otherwise(concat(lit("s"), expr("(label - 1) DIV 2")))
          .as("community"))
      .orderBy("node")
  }

  val lpaCommunitiesSql: String = {
    def iter(k: Int): String =
      s"""c$k AS (
         |  SELECT e.dst AS node, l.label, count(*) AS c
         |  FROM edges e JOIN l${k - 1} l ON l.node = e.src
         |  GROUP BY 1, 2
         |),
         |l$k AS (
         |  SELECT node, label FROM (
         |    SELECT node, label,
         |      row_number() OVER (PARTITION BY node
         |        ORDER BY c DESC, label) AS rn
         |    FROM c$k)
         |  WHERE rn = 1
         |)""".stripMargin
    s"""WITH p AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |),
       |edges AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
       |${(1 to LpaIterations).map(iter).mkString(",\n")}
       |SELECT
       |  CASE WHEN node % 2 = 0 THEN 'c' || (node // 2)
       |       ELSE 's' || ((node - 1) // 2) END AS node,
       |  CASE WHEN label % 2 = 0 THEN 'c' || (label // 2)
       |       ELSE 's' || ((label - 1) // 2) END AS community
       |FROM l$LpaIterations
       |ORDER BY node""".stripMargin
  }


  val KHop = 3
  val KHopSeeds = 3 // customers 0, 1, 2

  /** k-hop reachability over the trade graph from 3 seed customers —
    * bounded BFS ([[graft.ops.Graph.kHop]]): per hop, how many nodes
    * become reachable and a node-id checksum pinning exactly WHICH. On
    * the near-bipartite-complete trade graph the frontier saturates by
    * hop 2-3, which the oracle's level-by-level replay certifies.
    */
  def graphKhop(spark: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(Readers.table(spark, dir, "orders"),
      Readers.table(spark, dir, "lineitem"))
    val seeds = Readers.table(spark, dir, "customer")
      .filter(col("c_custkey") < KHopSeeds)
      .select((col("c_custkey") * 2L).as("node"))
    graft.ops.Graph.kHop(edges, seeds, KHop)
      .groupBy("hop")
      .agg(count(lit(1)).as("n_nodes"), sum("node").cast("long").as("node_sum"))
      .orderBy("hop")
  }

  val graphKhopSql: String = {
    def level(h: Int): String =
      s"""f$h AS (
         |  SELECT DISTINCT e.dst AS node, $h AS hop
         |  FROM edges e JOIN f${h - 1} f ON e.src = f.node
         |  WHERE e.dst NOT IN (SELECT node FROM r${h - 1})
         |),
         |r$h AS (SELECT node, hop FROM r${h - 1}
         |        UNION ALL SELECT node, hop FROM f$h)""".stripMargin
    val levels = (1 to KHop).map(level).mkString(",\n")
    s"""WITH p AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |),
       |edges AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
       |f0 AS (SELECT c_custkey * 2 AS node, 0 AS hop FROM customer
       |       WHERE c_custkey < $KHopSeeds),
       |r0 AS (SELECT node, hop FROM f0),
       |$levels
       |SELECT hop, CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(sum(node) AS BIGINT) AS node_sum
       |FROM r$KHop GROUP BY hop ORDER BY hop""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_khop" -> graphKhop,
    "pagerank" -> pagerank,
    "graph_triangles" -> triangleCounts,
    "lpa_communities" -> lpaCommunities)

  val oracle: Map[String, String] = Map(
    "graph_khop" -> graphKhopSql,
    "pagerank" -> pagerankSql,
    "graph_triangles" -> triangleCountsSql,
    "lpa_communities" -> lpaCommunitiesSql)
}

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank" -> pagerank)

  val oracle: Map[String, String] = Map(
    "pagerank" -> pagerankSql)
}

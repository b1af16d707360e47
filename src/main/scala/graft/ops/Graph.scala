package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on edge-list DataFrames. Companion to the
  * connected-components labeler in [[TextDedup.duplicateClusters]]: same
  * execution discipline (fixed shuffle budget per iteration,
  * `localCheckpoint` so the logical plan stays iteration-constant instead
  * of growing a join tower Catalyst must re-analyze every pass).
  *
  * PageRank here is the standard damped formulation WITHOUT dangling-mass
  * redistribution (callers whose graphs have sink nodes should add the
  * symmetric reverse edges, as the bipartite query does — a symmetric
  * graph has no sinks). Each iteration costs exactly two exchanges:
  *
  *   1. ranks join edges on src — both sides hash-partitioned on the
  *      same key, and `outdeg` is folded INTO the rank table up front so
  *      the loop joins two tables, not three;
  *   2. contribution sum keyed by dst — map-side combined, so the shuffle
  *      carries at most |V| rows per partition, not |E|.
  *
  * At 1000 executors the edge table partitioning is reused every
  * iteration (it never changes), which is the property that matters at
  * 100 TB — only rank rows (|V|, small) move per pass. GraphX-style
  * vertex cuts would shave the constant, not the shape.
  */
object Graph {

  /** Damped PageRank over `edges` (columns `src`, `dst`), a fixed number
    * of iterations from a uniform start. Returns (node, rank) for every
    * node appearing as src or dst; ranks sum to 1 on sink-free graphs.
    */
  def pageRank(edges: DataFrame, iterations: Int,
               damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    // materialize the edge list ONCE: everything below (nodes, degrees,
    // and every iteration's src-join) re-reads it, and without the
    // checkpoint the caller's edge-construction plan (often a join +
    // distinct) would re-execute per iteration
    val e = edges.select("src", "dst").localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    // 1-row count, broadcast into every per-node expression
    val n = nodes.agg(count(lit(1)).cast("double").as("__n"))
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    def withBase(df: DataFrame) = df.crossJoin(broadcast(n))
    // rank and outdeg travel together: the loop below joins edges against
    // ONE table keyed by node (outdeg 0 = sink; contributes nothing)
    var ranks = withBase(nodes)
      .join(deg, Seq("node"), "left")
      .select(col("node"), (lit(1.0) / col("__n")).as("rank"),
        coalesce(col("outdeg"), lit(0.0)).as("outdeg"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val inflow = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      ranks = withBase(nodes)
        .join(inflow, Seq("node"), "left")
        .join(deg, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"),
          coalesce(col("outdeg"), lit(0.0)).as("outdeg"))
        .localCheckpoint()
    }
    ranks.select("node", "rank")
  }
}

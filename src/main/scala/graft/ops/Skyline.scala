package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): rows not dominated on two minimized
  * dimensions. q dominates p iff q.x ≤ p.x ∧ q.y ≤ p.y with at least one
  * strict; ties on BOTH dimensions dominate neither way, so exact
  * duplicates of a frontier point all survive.
  *
  * The naive formulation is a NOT-EXISTS self-join — O(n²) pairs, a
  * broadcast-nested-loop at scale. This is the O(n log n) sort shape
  * instead:
  *
  *   1. collapse to distinct x with the min y per x (map-side-combined
  *      groupBy — output is |distinct x| rows, usually ≪ n);
  *   2. running min of y over x ascending, frame (unbounded, -1) — the
  *      best y among STRICTLY cheaper x;
  *   3. p survives iff y < that running min (nothing cheaper is as good)
  *      AND y equals its own x-group min (nothing equally cheap is
  *      strictly better).
  *
  * Step 2's window has no partition key — a single-reducer sort of the
  * DISTINCT-x table, not of the data. At 100 TB the distinct-x table is
  * the dimension-sized residue of a fact-sized input; if even that
  * overflows one task, range-partition x and prefix-scan per range with
  * the previous range's min carried over (the classic two-pass cumulative
  * shape) — the row-level join below is unchanged.
  */
object Skyline {

  /** Adds nothing and removes dominated rows: the Pareto frontier of `df`
    * minimizing (`x`, `y`). Both join sides hash-partition on x; the
    * frontier table is aggregate-sized.
    */
  def paretoFrontier(df: DataFrame, x: Column, y: Column): DataFrame = {
    val byX = df.groupBy(x.as("__x")).agg(min(y).as("__gmin"))
    val cheaper = Window.orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = byX
      .withColumn("__cheaper_min", min(col("__gmin")).over(cheaper))
      // survives iff better than everything strictly cheaper…
      .filter(col("__cheaper_min").isNull ||
        col("__gmin") < col("__cheaper_min"))
    df.join(frontier, x === col("__x") && y === col("__gmin"), "left_semi")
  }
}

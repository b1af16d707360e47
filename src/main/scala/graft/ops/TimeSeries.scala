package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series operators: densify (gap fill), fill/interpolate
  * missing values, resample to coarser buckets. Time travels as an INTEGER
  * grid index (epoch days/hours) — exact in every engine, exact in the
  * interpolation arithmetic, and immune to calendar/timezone divergence.
  *
  * Scale shapes:
  *   - densify: per-series min/max (map-side-combined aggregate) →
  *     `sequence()` + explode — the grid is generated, never shuffled in;
  *     the only exchange is the left join back to observations, both sides
  *     keyed (series, t);
  *   - fill/interpolate: the count-over-window GROUP TRICK — `count(v)`
  *     over the preceding frame increments at every observation, so rows
  *     sharing a group id share their most recent observation; one keyed
  *     sort covers all four window columns (forward pass), one more for
  *     the backward pass. No self-joins, no IGNORE NULLS dependence;
  *   - resample: window min/max timestamps inside the bucket pick the
  *     open/close rows deterministically (ties broken by taking the min
  *     value among tied timestamps), then one grouped aggregate.
  */
object TimeSeries {

  /** Densify (seriesCol, tCol) onto the full integer grid
    * [min(t), max(t)] per series: missing points appear with null in
    * every value column. `obs` must be unique per (series, t).
    */
  def gapFill(obs: DataFrame, seriesCol: String, tCol: String): DataFrame = {
    val grid = obs.groupBy(seriesCol)
      .agg(min(col(tCol)).as("__mn"), max(col(tCol)).as("__mx"))
      .select(col(seriesCol),
        explode(sequence(col("__mn"), col("__mx"))).as(tCol))
    grid.join(obs, Seq(seriesCol, tCol), "left")
  }

  /** Forward-fill plus linear interpolation of `valueCol` over the dense
    * grid from [[gapFill]]. Adds:
    *   - `ffill`: the most recent observed value (null before the first);
    *   - `interp`: linear between the surrounding observations, the
    *     nearest observed value at the edges.
    * All arithmetic is (rounded input ± exact grid ints) under single
    * IEEE mul/div — bit-reproducible across engines.
    */
  def fillInterpolate(dense: DataFrame, seriesCol: String, tCol: String,
                      valueCol: String): DataFrame = {
    val (s, t, v) = (col(seriesCol), col(tCol), col(valueCol))
    val fwd = Window.partitionBy(s).orderBy(t)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window.partitionBy(s).orderBy(t.desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byFwdGrp = Window.partitionBy(s, col("__g_f"))
    val byBwdGrp = Window.partitionBy(s, col("__g_b"))
    val staged = dense
      .withColumn("__g_f", count(v).over(fwd))
      .withColumn("__g_b", count(v).over(bwd))
      .withColumn("__pv", max(v).over(byFwdGrp))
      .withColumn("__pt", min(when(v.isNotNull, t)).over(byFwdGrp))
      .withColumn("__nv", max(v).over(byBwdGrp))
      .withColumn("__nt", max(when(v.isNotNull, t)).over(byBwdGrp))
    val interp = when(v.isNotNull, v)
      .when(col("__pv").isNull, col("__nv"))
      .when(col("__nv").isNull, col("__pv"))
      .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
        (t - col("__pt")) / (col("__nt") - col("__pt")))
    staged
      .withColumn("ffill", coalesce(v, col("__pv")))
      .withColumn("interp", interp)
      .drop("__g_f", "__g_b", "__pv", "__pt", "__nv", "__nt")
  }

  /** Truncated exponentially-weighted moving average: Σ αᵏ·lag(v,k) over
    * the last `depth` observations, normalized by the weights actually
    * present (so the series head uses the weights it has). The exact
    * recurrence needs either unbounded history or a sequential scan;
    * truncation turns it into a FIXED stack of lags on one window spec —
    * one keyed sort, bit-identical in any engine, and the dropped tail is
    * bounded by α^depth (callers pick depth to put that under their
    * tolerance).
    */
  def withEwmaTruncated(df: DataFrame, out: String, seriesCol: Column,
                        orderCol: Column, valueCol: Column,
                        alpha: Double, depth: Int): DataFrame = {
    require(depth >= 1 && alpha > 0 && alpha < 1, "need depth>=1, 0<alpha<1")
    val w = Window.partitionBy(seriesCol).orderBy(orderCol)
    // each lag materializes ONCE: the weighted term references its lag
    // three times (two null guards + the product), and window extraction
    // creates one physical function per OCCURRENCE — inlined, depth=8
    // planned ~24 lag functions where 8 suffice (PlanLint
    // duplicate-window-function; the withColumn chain collapses into a
    // single WindowExec via CollapseWindow)
    val lagNames = (0 until depth).map(k => s"__graft_ewma_l$k")
    val withLags = (0 until depth).foldLeft(df) { case (d, k) =>
      d.withColumn(lagNames(k), lag(valueCol, k).over(w))
    }
    val terms = (0 until depth).map { k =>
      val v = col(lagNames(k))
      (when(v.isNotNull, v * math.pow(alpha, k)), // weighted value or null
        when(v.isNotNull, lit(math.pow(alpha, k))).otherwise(lit(0.0)))
    }
    val num = terms.map(t => coalesce(t._1, lit(0.0))).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    withLags.withColumn(out, when(den > 0.0, num / den))
      .drop(lagNames: _*)
  }

  /** Resample to the coarser grid `bucket(t)`: count / min / max / mean
    * plus deterministic `open`/`close` — the value at the earliest /
    * latest t in the bucket, min-value tie-break.
    */
  def resample(obs: DataFrame, seriesCol: String, bucketCol: Column,
               tCol: String, valueCol: String): DataFrame = {
    val (t, v) = (col(tCol), col(valueCol))
    val w = Window.partitionBy(col(seriesCol), col("__bucket"))
    obs.withColumn("__bucket", bucketCol)
      .withColumn("__mn_t", min(t).over(w))
      .withColumn("__mx_t", max(t).over(w))
      .groupBy(col(seriesCol), col("__bucket").as("bucket"))
      .agg(count(v).as("n"),
        min(v).as("vmin"), max(v).as("vmax"),
        round(avg(v), 6).as("vmean"),
        min(when(t === col("__mn_t"), v)).as("open"),
        min(when(t === col("__mx_t"), v)).as("close"))
  }
}

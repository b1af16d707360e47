package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight observability via Spark's Observation API: metrics computed
  * ON the rows a job actually processes, harvested by the driver AFTER
  * the action — with NO second scan. At 100 TB this is the difference
  * between "the nightly load also ran three audit queries" (three more
  * full passes) and "the load itself reported its row count, null rate,
  * and value bounds as it wrote". The metrics ride the existing
  * physical plan as a CollectMetrics node; they cost one aggregation
  * buffer per task, not a pass.
  *
  * Contract notes:
  *   - `Observation.get` BLOCKS until the first action on the observed
  *     frame completes — attach, run the action, then read;
  *   - metrics reflect exactly the rows that flowed through the observe
  *     point (post-filter if attached after a filter, pre-join if
  *     before), so placement is part of the audit's meaning;
  *   - on a streaming query the same node reports per-micro-batch via
  *     `StreamingQueryProgress.observedMetrics` (spec-verified).
  */
object Observe {

  /** Attach a standard data-quality observation to `df`: row count, null
    * count of `keyCol`, and min/max of `valueCol`. Returns the observed
    * frame and the handle to harvest after an action.
    */
  def withQualityMetrics(df: DataFrame, keyCol: String, valueCol: String)
  : (DataFrame, Observation) = {
    // no-arg Observation ⇒ UUID name: observed-metric names must be
    // UNIQUE within a query, and a deterministic column-derived name
    // would collide the moment two audits of the same columns meet in
    // one action. Harvesting goes through the returned handle, so the
    // name never matters to the caller.
    val obs = Observation()
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      count(when(col(keyCol).isNull, 1)).as("n_null_key"),
      min(col(valueCol)).as("min_value"),
      max(col(valueCol)).as("max_value"))
    (observed, obs)
  }

  /** Attach arbitrary named metrics. */
  def withMetrics(df: DataFrame, name: String, metrics: Seq[Column])
  : (DataFrame, Observation) = {
    require(metrics.nonEmpty, "need at least one metric")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}

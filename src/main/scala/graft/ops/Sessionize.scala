package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each key's event stream into sessions at
  * inactivity gaps, the classic two-window formulation:
  *
  *   1. `lag(ts)` per key (ordered) → gap to previous event,
  *   2. running sum of "gap exceeded" flags → session ordinal,
  *   3. group by (key, ordinal) → session bounds + aggregates.
  *
  * Scale notes: one shuffle on the key; both windows and the final
  * aggregation share that partitioning, so Catalyst plans a single exchange.
  * Per-key data is streamed through the window operators in ts order — no
  * per-key materialization beyond the sort buffer (spill-backed). Hot keys
  * (one user with millions of events) sort-spill rather than OOM. The
  * Structured Streaming twin of this operator is `session_window` +
  * watermark (graft.streaming).
  */
object Sessionize {

  /** Assign session ordinals. Adds `session_no` (1-based per key).
    * `tieBreak` makes ordering total when `ts` has duplicates so results
    * are deterministic under any partitioning.
    */
  def withSessionNo(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
                    gapMicros: Long): DataFrame = {
    val order = Window.partitionBy(key).orderBy(ts, tieBreak)
    // materialize the lag ONCE: window extraction creates one physical
    // window function per occurrence (no dedup across the null-guard and
    // the subtraction — PlanLint's duplicate-window-function rule), so
    // the gap test must reference a column, not the lag expression
    val prev = "_prev_us"
    val isNew = when(col(prev).isNull ||
      (unix_micros(ts) - col(prev)) > gapMicros, 1L).otherwise(0L)
    df.withColumn(prev, lag(unix_micros(ts), 1).over(order))
      .withColumn("_new_session", isNew)
      .withColumn("session_no",
        sum(col("_new_session")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session", prev)
  }

  /** Full session summary: one row per (key, session_no). */
  def sessions(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
               gapMicros: Long, aggs: Seq[Column]): DataFrame =
    withSessionNo(df, key, ts, tieBreak, gapMicros)
      .groupBy(key.as("key"), col("session_no"))
      .agg(min(ts).as("session_start"),
        (Seq(max(ts).as("session_end"), count(lit(1)).as("n_events")) ++ aggs): _*)
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch event analytics: the same
  * declarative transforms applied to an unbounded source. Callers supply
  * any streaming DataFrame with (ts: timestamp, user_id, event_type,
  * value) — `readStream` over a parquet/kafka source, or MemoryStream in
  * tests.
  *
  * Watermarks bound state: an hour-window aggregate keeps only windows
  * newer than (max event time − watermark); session state is evicted the
  * same way. At 100 TB/day the state store is the scale constraint — these
  * queries key state by (window, event_type) and (user, session), both of
  * which are bounded by the watermark horizon, not by history.
  */
object EventStreams {

  /** Tumbling one-hour windowed counts/sums with a lateness watermark —
    * streaming twin of `Analytics.tumblingWindow`.
    */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based session windows per user (30-minute inactivity), the
    * streaming twin of `graft.ops.Sessionize` — `session_window` merges
    * events whose gaps are under the timeout, watermark evicts closed
    * sessions from the state store.
    */
  def sessionAggregates(events: DataFrame, gap: String = "30 minutes",
                        watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"), col("sum_value"))
}

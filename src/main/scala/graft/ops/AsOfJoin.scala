package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward as-of join: for each left row, the most recent
  * right row with `rightTime <= leftTime` on the same key (the
  * merge_asof / ASOF JOIN operator of time-series engines).
  *
  * Plan shape — built for scale, NOT the naive inequality join:
  *
  *   1. union left and right rows, tagged by side, with the right payload
  *      as a nullable struct;
  *   2. one window over (key) ordered by (time, side, tiebreak) taking
  *      `last(payload, ignoreNulls = true)` — each left row picks up the
  *      latest right payload at or before its timestamp;
  *   3. filter back to left rows.
  *
  * A `left JOIN right ON key = key AND rtime <= ltime` + argmax would
  * materialize every (left, right-before-it) pair — quadratic per key —
  * then shuffle all of it to rank. The union form shuffles each input row
  * exactly once (|L|+|R| rows, one exchange on the key) and streams each
  * key's timeline through a sort. Hot keys sort-spill rather than explode.
  *
  * Ordering inside a timestamp tie: right rows sort BEFORE left rows
  * (`rightTime <= leftTime` is inclusive), and among right rows the
  * `rightTieBreak` decides which one "wins" (the last in that order).
  */
object AsOfJoin {

  /** @param left           left (probe) rows
    * @param right          right (reference) rows
    * @param key            equi-join key column name (both sides)
    * @param leftTime       event-time column on `left`
    * @param rightTime      event-time column on `right`
    * @param rightPayload   columns of `right` to attach to each left row
    *                       (emitted as nullable `asof_<name>` columns)
    * @param rightTieBreak  total-order tiebreak among right rows sharing a
    *                       timestamp — the greatest wins
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightPayload.map(col): _*)
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(right.schema(rightTieBreak).dataType))
      .withColumn("_payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(rightPayload.map(c =>
          org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))))
    val r = right
      // a NULL right timestamp must not match anything ("rtime <= ltime"
      // is never true for null) — unfiltered it would sort nulls-FIRST in
      // the timeline and its payload would stick to every early left row
      .filter(col(rightTime).isNotNull)
      .select((Seq(col(key), col(rightTime).as("_t"), lit(0).as("_side"),
        col(rightTieBreak).as("_tie"), payload.as("_payload")) ++
        leftCols.filterNot(c => c == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)
      .select((Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        Seq(col("_t"), col("_side"), col("_tie"), col("_payload"))): _*)
    val w = Window.partitionBy(key)
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(r.columns.toIndexedSeq.map(col): _*).unionByName(r)
      .withColumn("_match", last("_payload", ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"_match.$c").as(s"asof_$c")): _*)
  }
}

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
               rightPayload: Seq[String], rightTieBreak: String): DataFrame =
    join(left, right, key, leftTime, rightTime, rightPayload, rightTieBreak,
      fwd = false, toleranceMicros = None)

  /** [[backward]] with `merge_asof`'s tolerance knob: a match further
    * than `toleranceMicros` behind the left row is discarded (nulls, as
    * if nothing matched) — the guard against joining a price quote from
    * last Tuesday onto today's trade. Row-local on top of the same
    * single-exchange plan; timestamp distances compare in microseconds,
    * numeric time columns at face value.
    */
  def backwardWithin(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String,
                     rightPayload: Seq[String], rightTieBreak: String,
                     toleranceMicros: Long): DataFrame =
    join(left, right, key, leftTime, rightTime, rightPayload, rightTieBreak,
      fwd = false, toleranceMicros = Some(toleranceMicros))

  /** [[forward]] with the tolerance knob — matches further than
    * `toleranceMicros` AHEAD are discarded.
    */
  def forwardWithin(left: DataFrame, right: DataFrame, key: String,
                    leftTime: String, rightTime: String,
                    rightPayload: Seq[String], rightTieBreak: String,
                    toleranceMicros: Long): DataFrame =
    join(left, right, key, leftTime, rightTime, rightPayload, rightTieBreak,
      fwd = true, toleranceMicros = Some(toleranceMicros))

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` on the same key (`merge_asof
    * direction='forward'`). Same union-window shape as [[backward]] with
    * the frame flipped; among right rows sharing the matched timestamp
    * the SMALLEST `rightTieBreak` wins (the mirror of backward's
    * greatest-wins).
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              rightPayload: Seq[String], rightTieBreak: String): DataFrame =
    join(left, right, key, leftTime, rightTime, rightPayload, rightTieBreak,
      fwd = true, toleranceMicros = None)

  private[ops] def toNum(c: Column,
                         dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    dt match {
      case TimestampType => unix_micros(c)
      case TimestampNTZType => unix_micros(c.cast(TimestampType))
      case _ => c.cast("double")
    }
  }

  private def join(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   rightPayload: Seq[String], rightTieBreak: String,
                   fwd: Boolean, toleranceMicros: Option[Long]): DataFrame = {
    val leftCols = left.columns.toSeq
    // the matched right row's own time rides the struct so tolerance can
    // measure the gap row-locally; dropped before output
    val payloadCols = if (toleranceMicros.isDefined)
      (rightPayload :+ rightTime).distinct else rightPayload
    val payload = struct(payloadCols.map(col): _*)
    // inclusive comparisons need equal-timestamp right rows on the
    // matchable side of the left row: BEFORE it (backward, rtime <=
    // ltime) or AFTER it (forward, rtime >= ltime)
    val (leftSide, rightSide) = if (fwd) (0, 1) else (1, 0)
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(leftSide))
      .withColumn("_tie", lit(null).cast(right.schema(rightTieBreak).dataType))
      .withColumn("_payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(payloadCols.map(c =>
          org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))))
    val r = right
      // a NULL right timestamp must not match anything ("rtime <= ltime"
      // is never true for null) — unfiltered it would sort nulls-FIRST in
      // the timeline and its payload would stick to every early left row
      .filter(col(rightTime).isNotNull)
      .select((Seq(col(key), col(rightTime).as("_t"), lit(rightSide).as("_side"),
        col(rightTieBreak).as("_tie"), payload.as("_payload")) ++
        leftCols.filterNot(c => c == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)
      .select((Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        Seq(col("_t"), col("_side"), col("_tie"), col("_payload"))): _*)
    val base = Window.partitionBy(key)
      .orderBy(col("_t"), col("_side"), col("_tie"))
    val unioned = l.select(r.columns.toIndexedSeq.map(col): _*).unionByName(r)
    val matched =
      if (fwd) unioned.withColumn("_match",
        first("_payload", ignoreNulls = true).over(
          base.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      else unioned.withColumn("_match",
        last("_payload", ignoreNulls = true).over(
          base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val gated = toleranceMicros.fold(matched) { tol =>
      val ltN = toNum(col("_t"), left.schema(leftTime).dataType)
      val mtN = toNum(col(s"_match.$rightTime"), right.schema(rightTime).dataType)
      val dist = if (fwd) mtN - ltN else ltN - mtN
      matched.withColumn("_match", when(dist <= tol, col("_match")))
    }
    gated
      .filter(col("_side") === leftSide)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"_match.$c").as(s"asof_$c")): _*)
  }

  /** Nearest as-of (`merge_asof direction='nearest'`): the backward or
    * forward match, whichever is closer in time; exact-distance ties
    * choose the BACKWARD match. Emitted as `asof_<payload>` plus
    * `asof_side` (`backward`/`forward`, null when neither side matched).
    *
    * Cost: both directional passes (two keyed window shuffles) plus the
    * row-local comparison — still |L|+|R| rows per pass, never a pair
    * join. Timestamp distances compare in microseconds; numeric time
    * columns compare as doubles.
    */
  def nearest(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              rightPayload: Seq[String], rightTieBreak: String): DataFrame =
    nearestImpl(left, right, key, leftTime, rightTime, rightPayload,
      rightTieBreak, toleranceMicros = None)

  /** [[nearest]] with `merge_asof(direction='nearest', tolerance=…)`
    * semantics: each DIRECTIONAL candidate is discarded when its own
    * distance exceeds `toleranceMicros` BEFORE the closer-of-the-two
    * choice — so a left row whose backward match is in tolerance but
    * whose (even closer) forward match is not still takes the backward
    * one, and a row with neither in tolerance gets nulls. Falls out of
    * the directional gates for free: an out-of-tolerance candidate
    * nullifies exactly like a missing one, and the tie-to-backward rule
    * then reads the surviving side.
    */
  def nearestWithin(left: DataFrame, right: DataFrame, key: String,
                    leftTime: String, rightTime: String,
                    rightPayload: Seq[String], rightTieBreak: String,
                    toleranceMicros: Long): DataFrame =
    nearestImpl(left, right, key, leftTime, rightTime, rightPayload,
      rightTieBreak, toleranceMicros = Some(toleranceMicros))

  private def nearestImpl(left: DataFrame, right: DataFrame, key: String,
                          leftTime: String, rightTime: String,
                          rightPayload: Seq[String], rightTieBreak: String,
                          toleranceMicros: Option[Long]): DataFrame = {
    val leftCols = left.columns.toSeq
    val pay = (rightPayload :+ rightTime).distinct
    val b = toleranceMicros.fold(
        backward(left, right, key, leftTime, rightTime, pay, rightTieBreak))(
        t => backwardWithin(left, right, key, leftTime, rightTime, pay,
          rightTieBreak, t))
      .select(leftCols.map(col) ++
        pay.map(c => col(s"asof_$c").as(s"__b_$c")): _*)
    val bf = toleranceMicros.fold(
        forward(b, right, key, leftTime, rightTime, pay, rightTieBreak))(
        t => forwardWithin(b, right, key, leftTime, rightTime, pay,
          rightTieBreak, t))
      .select((leftCols ++ pay.map(c => s"__b_$c")).map(col) ++
        pay.map(c => col(s"asof_$c").as(s"__f_$c")): _*)
    val lt = toNum(col(leftTime), left.schema(leftTime).dataType)
    val rdt = right.schema(rightTime).dataType
    val bDist = lt - toNum(col(s"__b_$rightTime"), rdt)
    val fDist = toNum(col(s"__f_$rightTime"), rdt) - lt
    val useB = col(s"__f_$rightTime").isNull ||
      (col(s"__b_$rightTime").isNotNull && bDist <= fDist)
    bf.select(leftCols.map(col) ++
      rightPayload.map(c =>
        when(useB, col(s"__b_$c")).otherwise(col(s"__f_$c")).as(s"asof_$c")) :+
      when(col(s"__b_$rightTime").isNull && col(s"__f_$rightTime").isNull,
          lit(null).cast("string"))
        .when(useB, lit("backward")).otherwise(lit("forward"))
        .as("asof_side"): _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over an event stream: ordered funnels, cohort
  * retention, last-touch attribution, per-group outlier detection. These
  * are the product-analytics operators a warehouse runs daily over its
  * hottest (largest) table, so every shape here is one-or-two-shuffle:
  *
  *   - funnel / attribution: a single exchange on the user key feeds a
  *     stack of same-spec window operators (Catalyst plans ONE sort), then
  *     a keyed aggregate on the partitioning already in place;
  *   - cohort retention: window-min for the cohort anchor (no self-join
  *     with the first-event table — that join would shuffle the fact twice),
  *     then one aggregate on the (cohort, offset) key;
  *   - outliers: whole-partition window stats (avg/stddev) — the two-pass
  *     mean/σ never leaves the executor holding the group.
  *
  * Per-user data streams through the window sort (spill-backed); a hot key
  * sorts and spills rather than OOMing. Nothing here materializes per-user
  * arrays or collects to the driver.
  */
object Behavior {

  /** Ordered-funnel qualification columns. For each step i, adds
    * `qual_i` = this row's epoch-micros iff the row is step i's event type
    * AND a qualifying step i-1 event occurred strictly earlier in the
    * user's stream (order = (ts, tieBreak), so simultaneous events resolve
    * deterministically). `qual_0` is simply "is the entry step".
    *
    * The "strictly earlier" check is `min(qual_{i-1})` over the frame
    * (unbounded preceding, -1): all window columns share one
    * partition+order spec, so the physical plan is a single sort with
    * stacked window operators — one shuffle total.
    */
  def funnelQualified(events: DataFrame, user: Column, ts: Column,
                      tieBreak: Column, typ: Column,
                      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(user.as("user_id"), unix_micros(ts).as("us"),
      tieBreak.as("tb"), typ.as("typ"))
    val before = Window.partitionBy(col("user_id")).orderBy(col("us"), col("tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val qual =
        if (i == 0) when(col("typ") === step, col("us"))
        else when(col("typ") === step &&
          min(col(s"qual_${i - 1}")).over(before).isNotNull, col("us"))
      df.withColumn(s"qual_$i", qual)
    }
  }

  /** Per-user funnel summary: first qualifying epoch-micros per step
    * (`step{i}_us`, null if the user never reached it) and `depth` =
    * deepest step reached (0 = never did the entry step).
    */
  def funnel(events: DataFrame, user: Column, ts: Column, tieBreak: Column,
             typ: Column, steps: Seq[String]): DataFrame = {
    val qualified = funnelQualified(events, user, ts, tieBreak, typ, steps)
    val stepMins = steps.indices.map(i => min(col(s"qual_$i")).as(s"step${i + 1}_us"))
    // fold forward so the deepest step's check ends up OUTERMOST:
    // when(step3, 3).otherwise(when(step2, 2).otherwise(when(step1, 1), 0))
    val depth = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"step${i + 1}_us").isNotNull, lit(i + 1)).otherwise(acc)
    }
    qualified.groupBy("user_id")
      .agg(stepMins.head, stepMins.tail: _*)
      .withColumn("depth", depth.cast("int"))
  }

  /** Cohort retention: users are cohorted by the week of their first
    * event (the window-min anchor — no first-event self-join), and each
    * (cohort week, week offset) cell counts the distinct users active in
    * that offset week. The anchor window and the final aggregate are the
    * only two shuffles, independent of how many weeks the data spans.
    */
  def cohortRetention(events: DataFrame, user: Column, ts: Column): DataFrame = {
    // cohort_week stays a TIMESTAMP end-to-end (a DATE column would read
    // back as python dates vs datetime64 in the cross-engine compare)
    val anchored = events.select(user.as("user_id"), ts.as("ts"))
      .withColumn("cohort_week",
        date_trunc("week", min(col("ts")).over(Window.partitionBy(col("user_id")))))
      .withColumn("week", date_trunc("week", col("ts")))
    anchored
      .withColumn("week_offset",
        (datediff(col("week").cast("date"), col("cohort_week").cast("date")) / 7)
          .cast("long"))
      .groupBy("cohort_week", "week_offset")
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** Event-type code for the packed-long attribution trick (alphabetical,
    * stable across engines).
    */
  def typeCode(typ: Column, types: Seq[String]): Column =
    types.zipWithIndex.foldLeft(lit(null).cast("long")) { case (acc, (t, i)) =>
      when(typ === t, lit(i.toLong)).otherwise(acc)
    }

  /** Last-touch attribution: each conversion event is attributed to the
    * most recent preceding non-conversion event in the user's stream.
    *
    * The "most recent preceding" is the packed-long argmax from the
    * Vectors playbook: pack (epoch_micros, type_code) into one BIGINT
    * (`us * 8 + code` — micros fit 2^60, codes fit 3 bits) and take
    * `max(packed)` over the (unbounded preceding, -1) frame. One window
    * max instead of a per-row backward self-join; decode with integer
    * DIV/% so the quotient stays exact (a double division would lose
    * precision above 2^53).
    */
  def lastTouchAttribution(events: DataFrame, user: Column, ts: Column,
                           tieBreak: Column, typ: Column,
                           conversionType: String,
                           touchTypes: Seq[String]): DataFrame = {
    val base = events.select(tieBreak.as("event_id"), user.as("user_id"),
      unix_micros(ts).as("us"), typ.as("typ"))
    val before = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = when(col("typ") =!= conversionType,
      col("us") * 8L + typeCode(col("typ"), touchTypes))
    val decodeType = touchTypes.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (t, i)) => when(col("prev_packed") % 8L === i.toLong, lit(t)).otherwise(acc)
    }
    base
      .withColumn("prev_packed", max(packed).over(before))
      .filter(col("typ") === conversionType)
      .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
        decodeType.as("attr_type"),
        expr("prev_packed DIV 8").as("attr_us"))
  }

  /** Slowly-changing-dimension (type 2) build from an event stream: per
    * key, collapse consecutive same-state events into versioned validity
    * intervals `[valid_from_us, valid_to_us)` (null `valid_to_us` = the
    * current version). The warehouse op that turns a change log into a
    * point-in-time-joinable dimension.
    *
    * Shape: one exchange on the key feeds three same-spec window ops
    * (change detection via `lag`, then `lead` + `row_number` over the
    * surviving change rows — Catalyst plans one sort, the second window
    * reuses the partitioning). No self-joins; at 100 TB this is the only
    * shuffle and it is the unavoidable one (per-key ordering).
    */
  def scd2(events: DataFrame, key: Column, ts: Column, tieBreak: Column,
           state: Column): DataFrame = {
    val base = events.select(key.as("k"), unix_micros(ts).as("us"),
      tieBreak.as("tb"), state.as("state"))
    val stream = Window.partitionBy(col("k")).orderBy(col("us"), col("tb"))
    val changes = base
      .withColumn("prev", lag(col("state"), 1).over(stream))
      // null-safe inequality: the first event (prev = null) opens version 1
      .filter(!(col("state") <=> col("prev")))
    changes
      .withColumn("version", row_number().over(stream).cast("long"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(stream))
      .select(col("k"), col("version"), col("state"),
        col("us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  /** First-order Markov transition matrix over an event stream: for each
    * ordered pair of consecutive event states within a key, the transition
    * count and the row-normalized probability. The `lag` is one keyed
    * window (the same single unavoidable shuffle as [[scd2]]); the
    * (from, to) aggregate map-side combines down to |states|² rows, so the
    * matrix costs one more (tiny) exchange regardless of input size.
    */
  def markovTransitions(events: DataFrame, key: Column, ts: Column,
                        tieBreak: Column, state: Column): DataFrame = {
    val stream = Window.partitionBy(col("k")).orderBy(col("us"), col("tb"))
    events.select(key.as("k"), unix_micros(ts).as("us"), tieBreak.as("tb"),
        state.as("to_state"))
      .withColumn("from_state", lag(col("to_state"), 1).over(stream))
      .filter(col("from_state").isNotNull)
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("from_state"))), 6))
  }

  /** Per-group z-score outliers: rows whose value is more than `threshold`
    * sample standard deviations from their group mean. Group stats come
    * from whole-partition windows (one shuffle on the group key); the
    * z-score is rounded BEFORE thresholding so the keep/drop decision is a
    * pure function of the rounded value every engine agrees on.
    */
  def zScoreOutliers(df: DataFrame, group: Column, value: Column,
                     threshold: Double): DataFrame = {
    val w = Window.partitionBy(group)
    val z = round((value - avg(value).over(w)) / stddev_samp(value).over(w), 6)
    df.withColumn("z", z).filter(abs(col("z")) > threshold)
  }
}

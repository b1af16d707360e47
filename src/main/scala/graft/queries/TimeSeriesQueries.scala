package graft.queries

import graft.etl.Readers
import graft.ops.TimeSeries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series queries over `events`, on integer grids (epoch days /
  * hours — exact in both engines, no calendar arithmetic in the hot
  * path). Oracles use the identical count-over-window group trick, so no
  * engine-specific IGNORE NULLS is involved.
  */
object TimeSeriesQueries {

  private def dailyCounts(spark: SparkSession, dir: String): DataFrame =
    Readers.events(spark, dir)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day_idx"))
      .groupBy("event_type", "day_idx")
      .agg(count(lit(1)).as("n"))

  /** Daily event counts per type, densified onto the full day grid with
    * zero-filled gaps.
    */
  def tsGapFill(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.gapFill(dailyCounts(spark, dir), "event_type", "day_idx")
      .select(col("event_type"), col("day_idx"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("event_type", "day_idx")

  private val dailySql =
    """SELECT event_type,
      |  date_diff('day', DATE '1970-01-01',
      |            CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day_idx,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  private val gridSql =
    """SELECT event_type, unnest(generate_series(mn, mx)) AS day_idx
      |FROM (SELECT event_type, min(day_idx) AS mn, max(day_idx) AS mx
      |      FROM d GROUP BY 1)""".stripMargin

  val tsGapFillSql: String =
    s"""WITH d AS ($dailySql),
       |grid AS ($gridSql)
       |SELECT g.event_type, g.day_idx, COALESCE(d.n, 0) AS n
       |FROM grid g LEFT JOIN d USING (event_type, day_idx)
       |ORDER BY 1, 2""".stripMargin

  /** Daily mean `value` per type with gaps forward-filled AND linearly
    * interpolated. The daily mean is rounded to 6 decimals BEFORE
    * interpolation, so the interpolation arithmetic runs on identical
    * inputs in both engines and is bit-reproducible.
    */
  def tsInterpolate(spark: SparkSession, dir: String): DataFrame = {
    val daily = Readers.events(spark, dir)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day_idx"),
        col("value"))
      .groupBy("event_type", "day_idx")
      .agg(round(avg(col("value")), 6).as("v"))
    val dense = TimeSeries.gapFill(daily, "event_type", "day_idx")
    TimeSeries.fillInterpolate(dense, "event_type", "day_idx", "v")
      .select(col("event_type"), col("day_idx"), col("v"),
        round(col("ffill"), 6).as("ffill_r"),
        round(col("interp"), 6).as("interp_r"))
      .orderBy("event_type", "day_idx")
  }

  val tsInterpolateSql: String =
    """WITH d AS (
      |  SELECT event_type,
      |    date_diff('day', DATE '1970-01-01',
      |              CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day_idx,
      |    round(avg(value), 6) AS v
      |  FROM events GROUP BY 1, 2
      |),
      |grid AS (
      |  SELECT event_type, unnest(generate_series(mn, mx)) AS day_idx
      |  FROM (SELECT event_type, min(day_idx) AS mn, max(day_idx) AS mx
      |        FROM d GROUP BY 1)
      |),
      |dense AS (
      |  SELECT g.event_type, g.day_idx, d.v
      |  FROM grid g LEFT JOIN d USING (event_type, day_idx)
      |),
      |staged AS (
      |  SELECT *,
      |    count(v) OVER (PARTITION BY event_type ORDER BY day_idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g_f,
      |    count(v) OVER (PARTITION BY event_type ORDER BY day_idx DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g_b
      |  FROM dense
      |),
      |neighbors AS (
      |  SELECT *,
      |    max(v) OVER (PARTITION BY event_type, g_f) AS pv,
      |    min(CASE WHEN v IS NOT NULL THEN day_idx END)
      |      OVER (PARTITION BY event_type, g_f) AS pt,
      |    max(v) OVER (PARTITION BY event_type, g_b) AS nv,
      |    max(CASE WHEN v IS NOT NULL THEN day_idx END)
      |      OVER (PARTITION BY event_type, g_b) AS nt
      |  FROM staged
      |)
      |SELECT event_type, day_idx, v,
      |  round(COALESCE(v, pv), 6) AS ffill_r,
      |  round(CASE WHEN v IS NOT NULL THEN v
      |             WHEN pv IS NULL THEN nv
      |             WHEN nv IS NULL THEN pv
      |             ELSE pv + (nv - pv) * (day_idx - pt) / (nt - pt)
      |        END, 6) AS interp_r
      |FROM neighbors ORDER BY event_type, day_idx""".stripMargin

  /** Hourly OHLC-style resample of `value` per event type, with the
    * deterministic open/close rule (min value among tied boundary
    * timestamps).
    */
  def tsResample(spark: SparkSession, dir: String): DataFrame = {
    val obs = Readers.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("value"))
    TimeSeries.resample(obs, "event_type",
        expr("us DIV 3600000000").as("hour_idx"), "us", "value")
      .withColumnRenamed("bucket", "hour_idx")
      .orderBy("event_type", "hour_idx")
  }

  val tsResampleSql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
      |  FROM events
      |),
      |w AS (
      |  SELECT *, us // 3600000000 AS hour_idx,
      |    min(us) OVER (PARTITION BY event_type, us // 3600000000) AS mn_t,
      |    max(us) OVER (PARTITION BY event_type, us // 3600000000) AS mx_t
      |  FROM e
      |)
      |SELECT event_type, hour_idx, CAST(count(value) AS BIGINT) AS n,
      |  min(value) AS vmin, max(value) AS vmax,
      |  round(avg(value), 6) AS vmean,
      |  min(CASE WHEN us = mn_t THEN value END) AS open,
      |  min(CASE WHEN us = mx_t THEN value END) AS close
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val EwmaAlpha = 0.7
  val EwmaDepth = 8

  private def dailyMeans(spark: SparkSession, dir: String): DataFrame =
    Readers.events(spark, dir)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day_idx"),
        col("value"))
      .groupBy("event_type", "day_idx")
      .agg(round(avg(col("value")), 6).as("v"))

  /** Smoothed daily series: truncated EWMA plus a 7-observation rolling
    * median, both on ONE window partitioning (Catalyst plans a single
    * sort). The rounded daily mean is the shared input so every
    * downstream double op is bit-reproducible.
    */
  def tsSmooth(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
      .rowsBetween(-6, Window.currentRow)
    TimeSeries.withEwmaTruncated(dailyMeans(spark, dir), "__ew",
        col("event_type"), col("day_idx"), col("v"), EwmaAlpha, EwmaDepth)
      .withColumn("ewma", round(col("__ew"), 6)).drop("__ew")
      // Spark refuses exact percentile aggregates over a FRAME; a 7-row
      // frame makes collect+sort+interpolate the honest equivalent (and
      // the array is bounded by the frame, not the data)
      .withColumn("__fr", array_sort(collect_list(col("v")).over(w)))
      .withColumn("med7", round(
        when(size(col("__fr")) % 2 === 1,
          element_at(col("__fr"),
            ((size(col("__fr")) + 1) / 2).cast("int")))
          .otherwise((
            element_at(col("__fr"), (size(col("__fr")) / 2).cast("int")) +
            element_at(col("__fr"),
              (size(col("__fr")) / 2).cast("int") + 1)) / 2.0), 6))
      .drop("__fr")
      .orderBy("event_type", "day_idx")
  }

  val tsSmoothSql: String = {
    val terms = (0 until EwmaDepth).map { k =>
      val wt = s"power(${EwmaAlpha}::DOUBLE, $k)"
      (s"COALESCE(lag(v, $k) OVER ws * $wt, 0.0)",
        s"CASE WHEN lag(v, $k) OVER ws IS NOT NULL THEN $wt ELSE 0.0 END")
    }
    s"""WITH d AS (
       |  SELECT event_type,
       |    date_diff('day', DATE '1970-01-01',
       |              CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day_idx,
       |    round(avg(value), 6) AS v
       |  FROM events GROUP BY 1, 2
       |)
       |SELECT event_type, day_idx, v,
       |  round((${terms.map(_._1).mkString(" + ")}) /
       |        (${terms.map(_._2).mkString(" + ")}), 6) AS ewma,
       |  round(median(v) OVER (PARTITION BY event_type
       |    ORDER BY day_idx ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
       |    AS med7
       |FROM d
       |WINDOW ws AS (PARTITION BY event_type ORDER BY day_idx)
       |ORDER BY event_type, day_idx""".stripMargin
  }

  val RollN = 7

  /** Rolling 7-observation Pearson correlation between a series' value
    * and its own day index (a trend detector): all five sufficient sums
    * ride ONE window spec, and the correlation is closed-form arithmetic
    * on them. Windows with zero variance emit null. Inputs are the
    * rounded daily means, so the sums are engine-identical up to
    * summation order (round 6 absorbs the ULPs).
    */
  def tsRollingCorr(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
      .rowsBetween(-(RollN - 1), Window.currentRow)
    val x = col("day_idx").cast("double"); val y = col("v")
    // the six sufficient statistics materialize ONCE each: the closed
    // form references n five times and each sum up to three — inlined,
    // window extraction planned ~19 same-frame aggregates where six
    // suffice (PlanLint duplicate-window-function); the closed form now
    // runs in a plain projection above one six-function WindowExec
    val sums = Seq(
      "__n" -> count(y).over(w).cast("double"),
      "__sx" -> sum(x).over(w), "__sy" -> sum(y).over(w),
      "__sxy" -> sum(x * y).over(w),
      "__sxx" -> sum(x * x).over(w), "__syy" -> sum(y * y).over(w))
    val n = col("__n"); val sx = col("__sx"); val sy = col("__sy")
    val cov = n * col("__sxy") - sx * sy
    val varx = n * col("__sxx") - sx * sx
    val vary = n * col("__syy") - sy * sy
    sums.foldLeft(dailyMeans(spark, dir)) {
        case (d, (nm, c)) => d.withColumn(nm, c)
      }
      .withColumn("__vx", varx).withColumn("__vy", vary)
      .withColumn("trend_r",
        round(when(col("__vx") > 0.0 && col("__vy") > 0.0,
          cov / sqrt(col("__vx")) / sqrt(col("__vy"))), 6))
      .drop(sums.map(_._1) :+ "__vx" :+ "__vy": _*)
      .orderBy("event_type", "day_idx")
  }

  val tsRollingCorrSql: String =
    s"""WITH d AS (
       |  SELECT event_type,
       |    date_diff('day', DATE '1970-01-01',
       |              CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day_idx,
       |    round(avg(value), 6) AS v
       |  FROM events GROUP BY 1, 2
       |),
       |s AS (
       |  SELECT event_type, day_idx, v,
       |    count(v) OVER w::DOUBLE AS n,
       |    sum(day_idx::DOUBLE) OVER w AS sx, sum(v) OVER w AS sy,
       |    sum(day_idx::DOUBLE * v) OVER w AS sxy,
       |    sum(day_idx::DOUBLE * day_idx::DOUBLE) OVER w AS sxx,
       |    sum(v * v) OVER w AS syy
       |  FROM d
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
       |    ROWS BETWEEN ${RollN - 1} PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_type, day_idx, v,
       |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
       |    THEN (n * sxy - sx * sy) / sqrt(n * sxx - sx * sx)
       |         / sqrt(n * syy - sy * sy) END, 6) AS trend_r
       |FROM s ORDER BY event_type, day_idx""".stripMargin

  val AnomalyWindow = 7
  val AnomalyZ = 2.5

  /** Trailing-baseline anomaly flags on the daily series: each day's count
    * scored against the mean/stddev of the PRECEDING `AnomalyWindow` days
    * (current day excluded — the candidate must not contaminate its own
    * baseline). |z| > `AnomalyZ` flags the spike/crater. One window pass
    * per series; at any scale this is a per-key sorted window over
    * |days|-sized pre-aggregated data, never over raw events.
    */
  def tsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day_idx")
      .rowsBetween(-AnomalyWindow, -1)
    dailyCounts(spark, dir)
      .withColumn("mu", avg(col("n")).over(w))
      .withColumn("sd", stddev_samp(col("n")).over(w))
      .filter(col("sd").isNotNull && col("sd") > 0.0)
      .select(col("event_type"), col("day_idx"), col("n"),
        round((col("n") - col("mu")) / col("sd"), 6).as("z"),
        (abs((col("n") - col("mu")) / col("sd")) > AnomalyZ).as("anomaly"))
      .orderBy("event_type", "day_idx")
  }

  val tsAnomalySql: String =
    s"""WITH d AS ($dailySql),
       |s AS (
       |  SELECT event_type, day_idx, n,
       |    avg(n) OVER w AS mu, stddev_samp(n) OVER w AS sd
       |  FROM d
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
       |    ROWS BETWEEN $AnomalyWindow PRECEDING AND 1 PRECEDING)
       |)
       |SELECT event_type, day_idx, n,
       |  round((n - mu) / sd, 6) AS z,
       |  abs((n - mu) / sd) > $AnomalyZ::DOUBLE AS anomaly
       |FROM s WHERE sd IS NOT NULL AND sd > 0
       |ORDER BY event_type, day_idx""".stripMargin

  val SeasonLag = 7

  /** Forecast backtest: seasonal-naive forecast (the value `SeasonLag`
    * observations back) scored per series with MAE and MASE — MASE
    * normalizes by the in-sample naive-1 MAE, the standard
    * scale-free yardstick that says "beat the naive forecast or don't
    * ship". Two `lag` frames on ONE window spec over the pre-aggregated
    * daily series; lags are observation-lags on the observed grid (both
    * engines see identical rows, so the semantics agree exactly).
    */
  def tsBacktest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day_idx")
    dailyCounts(spark, dir)
      .withColumn("f", lag(col("n"), SeasonLag).over(w))
      .withColumn("p", lag(col("n"), 1).over(w))
      .groupBy("event_type")
      .agg(count(col("f")).as("n_scored"),
        round(avg(abs(col("n") - col("f"))), 6).as("mae"),
        // a constant series has naive-1 MAE 0; pin the degenerate case to
        // NULL on both engines (Spark's non-ANSI 0-divisor NULL vs
        // DuckDB's IEEE inf would otherwise diverge)
        round(when(avg(abs(col("n") - col("p"))) > 0,
          avg(abs(col("n") - col("f"))) /
            avg(abs(col("n") - col("p")))), 6).as("mase"))
      .orderBy("event_type")
  }

  val tsBacktestSql: String =
    s"""WITH d AS ($dailySql),
       |l AS (
       |  SELECT event_type, n,
       |    lag(n, $SeasonLag) OVER w AS f, lag(n, 1) OVER w AS p
       |  FROM d
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx)
       |)
       |SELECT event_type, CAST(count(f) AS BIGINT) AS n_scored,
       |  round(avg(abs(n - f)), 6) AS mae,
       |  round(avg(abs(n - f)) / nullif(avg(abs(n - p)), 0), 6) AS mase
       |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Theil–Sen robust trend per series: the median of all pairwise
    * slopes over the daily grid — a single wild day moves the OLS slope,
    * not this one. The pairwise expansion is per-series days² (bounded
    * by the calendar, NOT by event volume — the aggregation to daily
    * counts happens first), and the grouped median buffers at most that
    * many slopes per series.
    */
  def tsTheilSen(spark: SparkSession, dir: String): DataFrame = {
    // both self-join sides reuse dailyCounts' exchange (ReuseExchange)
    val d = dailyCounts(spark, dir)
    d.as("a")
      .join(d.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.day_idx") < col("b.day_idx"))
      .select(col("a.event_type").as("event_type"),
        ((col("b.n") - col("a.n")).cast("double") /
          (col("b.day_idx") - col("a.day_idx"))).as("slope"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)"), 6).as("sen_slope"))
      .orderBy("event_type")
  }

  val tsTheilSenSql: String =
    s"""WITH d AS ($dailySql),
       |s AS (
       |  SELECT a.event_type,
       |    (b.n - a.n)::DOUBLE / (b.day_idx - a.day_idx) AS slope
       |  FROM d a JOIN d b
       |    ON a.event_type = b.event_type AND a.day_idx < b.day_idx
       |)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       |  round(quantile_cont(slope, 0.5), 6) AS sen_slope
       |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Week-over-week growth: weekly event counts per type with the prior
    * week's count and the percent delta — the standard BI trend readout.
    * Weeks are integer epoch-week indexes (exact in both engines); the
    * lag is one keyed window over the |weeks|-sized pre-aggregate.
    * Growth is null on each series' first week (no denominator).
    */
  def wowGrowth(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("week_idx")
    Readers.events(spark, dir)
      .select(col("event_type"),
        (datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long") / 7L).cast("long").as("week_idx"))
      .groupBy("event_type", "week_idx")
      .agg(count(lit(1)).as("n"))
      .withColumn("prev", lag(col("n"), 1).over(w))
      .select(col("event_type"), col("week_idx"), col("n"), col("prev"),
        round((col("n") - col("prev")).cast("double") / col("prev") * 100.0, 4)
          .as("wow_pct"))
      .orderBy("event_type", "week_idx")
  }

  val wowGrowthSql: String =
    """WITH d AS (
      |  SELECT event_type,
      |    date_diff('day', DATE '1970-01-01',
      |              CAST(CAST(ts AS TIMESTAMP) AS DATE)) // 7 AS week_idx,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2
      |),
      |l AS (
      |  SELECT event_type, week_idx, n,
      |    lag(n, 1) OVER (PARTITION BY event_type ORDER BY week_idx) AS prev
      |  FROM d
      |)
      |SELECT event_type, week_idx, n, prev,
      |  round((n - prev)::DOUBLE / prev * 100.0, 4) AS wow_pct
      |FROM l ORDER BY event_type, week_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wow_growth" -> wowGrowth,
    "ts_backtest" -> tsBacktest,
    "ts_theil_sen" -> tsTheilSen,
    "ts_anomaly" -> tsAnomaly,
    "ts_rolling_corr" -> tsRollingCorr,
    "ts_gap_fill" -> tsGapFill,
    "ts_interpolate" -> tsInterpolate,
    "ts_resample" -> tsResample,
    "ts_smooth" -> tsSmooth)

  val oracle: Map[String, String] = Map(
    "wow_growth" -> wowGrowthSql,
    "ts_backtest" -> tsBacktestSql,
    "ts_theil_sen" -> tsTheilSenSql,
    "ts_anomaly" -> tsAnomalySql,
    "ts_rolling_corr" -> tsRollingCorrSql,
    "ts_gap_fill" -> tsGapFillSql,
    "ts_interpolate" -> tsInterpolateSql,
    "ts_resample" -> tsResampleSql,
    "ts_smooth" -> tsSmoothSql)
}

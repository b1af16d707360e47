package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Data-profiling operators: the first thing a pipeline runs against a new
  * 100 TB delivery.
  *
  * [[profile]] computes every column's stats in ONE aggregation pass over
  * the table (a per-column loop of `df.select(...).agg(...)` would scan the
  * data once per column). The single wide aggregate row is then unpivoted
  * driver-side — it is one row, column count wide; the data never moves.
  */
object Profiling {

  /** Pairwise Pearson correlations of `cols`, all from ONE aggregation
    * pass (n·(n-1)/2 parallel `corr` aggregates — each a constant-size
    * co-moment state, map-side combined; the scan dominates, as it
    * should). The 1-row aggregate is unpivoted in-plan via explode of a
    * struct array — rows never move for the reshape. Correlations are
    * rounded to 6 decimals: the co-moment merge order varies with
    * partitioning, so the raw last ULP is not reproducible — the rounded
    * value is.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"${a}__$b")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"${a}__$b").as("pearson_r"))
    }
    one.select(explode(array(stacked: _*)).as("r")).select(col("r.*"))
  }

  /** Per-column profile: (column, n_nulls, n_distinct, min_num, max_num) —
    * numeric min/max as double, null for non-numeric columns. Exact
    * distinct counts (`count(DISTINCT col)` per column in one aggregate —
    * Spark plans the multi-distinct via expand); swap to
    * `approx_count_distinct` at scales where exact per-column distinct
    * state is unaffordable.
    */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields
    val aggs: Seq[Column] = cols.flatMap { f =>
      // backtick-quote: raw delivery column names may contain dots, which
      // bare col() would parse as nested-field paths
      val c = col(s"`${f.name}`")
      val (mn, mx) = f.dataType match {
        case _: NumericType =>
          (min(c).cast("double"), max(c).cast("double"))
        case _ =>
          (lit(null).cast("double"), lit(null).cast("double"))
      }
      Seq(
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        countDistinct(c).as(s"${f.name}__distinct"),
        mn.as(s"${f.name}__min"),
        mx.as(s"${f.name}__max"))
    }.toSeq
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.indices.map { i =>
      (cols(i).name,
        row.getLong(i * 4),
        row.getLong(i * 4 + 1),
        Option(row.get(i * 4 + 2)).map(_.asInstanceOf[Double]),
        Option(row.get(i * 4 + 3)).map(_.asInstanceOf[Double]))
    }.toDF("col_name", "n_nulls", "n_distinct", "min_num", "max_num")
  }

  /** Fixed-bound equi-width histogram of a numeric column: bucket 0 =
    * below lo, buckets+1 = at/above hi, else 1-based equal-width bins
    * (width_bucket semantics, spelled as explicit floor arithmetic so the
    * identical IEEE expression runs in any engine — built-in
    * `width_bucket`s differ in evaluation order at bin boundaries).
    * Fixed bounds keep it one pass; deriving bounds from the data is the
    * cheap min/max pass [[profile]] already provides.
    */
  def histogram(df: DataFrame, c: Column, lo: Double, hi: Double,
                buckets: Int): DataFrame = {
    val step = (hi - lo) / buckets
    df.select(
        when(c.isNull, lit(null))
          .when(c < lo, lit(0L))
          .when(c >= hi, lit(buckets + 1L))
          // least(): (c-lo)/step can round UP to exactly `buckets` for an
          // in-range c one ULP under hi — clamp so in-range values never
          // land in the overflow bucket (oracle must mirror the clamp)
          .otherwise(least(floor((c - lit(lo)) / lit(step)) + 1L,
            lit(buckets.toLong)))
          .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
  }
}

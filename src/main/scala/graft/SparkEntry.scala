package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, AnalyticsExt, BehaviorQueries, Core, CurationQueries, GraphQueries, LayoutQueries, MultimodalQueries, QualityQueries, SearchQueries, SqlSurface, StatsQueries, TextModelQueries, TimeSeriesQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-domain query modules under
  * `graft.queries`; every key has a matching DuckDB oracle in `oracleSql`
  * unless the operator is not SQL-expressible (then the driver records a
  * rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Core.denormalizedFlagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Core.queries ++ Analytics.queries ++ AnalyticsExt.queries ++
      TextQueries.queries ++ VectorQueries.queries ++
      MultimodalQueries.queries ++ CurationQueries.queries ++
      LayoutQueries.queries ++ BehaviorQueries.queries ++
      SearchQueries.queries ++ TextModelQueries.queries ++
      QualityQueries.queries ++ StatsQueries.queries ++ GraphQueries.queries ++
      TimeSeriesQueries.queries ++ SqlSurface.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Core.oracle ++ Analytics.oracle ++ AnalyticsExt.oracle ++
      TextQueries.oracle ++ VectorQueries.oracle ++
      MultimodalQueries.oracle ++ CurationQueries.oracle ++
      LayoutQueries.oracle ++ BehaviorQueries.oracle ++
      SearchQueries.oracle ++ TextModelQueries.oracle ++
      QualityQueries.oracle ++ StatsQueries.oracle ++ GraphQueries.oracle ++
      TimeSeriesQueries.oracle ++ SqlSurface.oracle
}

package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's local-session contract, used by every shipped
  * main (Bench/Verify/Smoke/dev tools): shuffle partitions sized to cores,
  * UTC, the nanos-as-long flag the events table requires, and the graft
  * extensions (operator lowering + SQL functions). Config drift between
  * mains — e.g. one missing `nanosAsLong` and failing on the events
  * parquet — is exactly the bug this prevents.
  */
object SparkSessions {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark
  }

  /** cpus from SPARK_GRAFT_CPUS, defaulting as the driver harness does. */
  def localFromEnv(defaultCpus: String = "4"): SparkSession =
    local(sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus))
}

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
      // The generated-class cache defaults to 100 entries. A session running
      // a wide query surface (the 70-query bench suite emits several hundred
      // whole-stage-codegen units per pass) churns it completely, so every
      // pass re-pays Janino compilation + classloading for every stage —
      // measured as the r2 join_left/join_salted "regression" (plans were
      // byte-identical to r1; the 36-query r1 suite mostly fit the cache).
      // A long-lived analytics session should size this to its working set.
      // (env-overridable so cache-churn hypotheses are testable per run)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8000"))
      // Shuffle/spill scratch on tmpfs when available: this harness's
      // virtual disk sustains ~8 MB/s synced writes (measured round 7),
      // so on /tmp the shuffle-heaviest queries time the disk, not the
      // engine — dedup_ngram_jaccard degraded 12x while scan-shaped
      // queries moved 2x. A real cluster provisions NVMe scratch for
      // exactly this reason; tmpfs is this single-node box's equivalent.
      // sf0.1 shuffle volumes are ≤ a few GB against 126 GB of tmpfs.
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
          if (new java.io.File("/dev/shm").canWrite) "/dev/shm/graft-scratch"
          else System.getProperty("java.io.tmpdir")))
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark
  }

  /** cpus from SPARK_GRAFT_CPUS, defaulting as the driver harness does. */
  def localFromEnv(defaultCpus: String = "4"): SparkSession =
    local(sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus))
}

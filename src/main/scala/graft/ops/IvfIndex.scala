package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted IVF index: centroid assignments written as a parquet table
  * PHYSICALLY PARTITIONED by `centroid_id`, so a probe that joins on the
  * centroid key reads ONLY the probed cells' directories — the scan-side
  * realization of the ANN scale story (the centroid id doubles as the
  * partition key at 100 TB; `ARCHITECTURE.md` §ANN).
  *
  * Layout per cell (`centroid_id=<id>/...`): the member vectors with any
  * precomputed probe-side columns (norms), i.e. everything a probe needs
  * so it never touches the raw corpus. Cell skew mirrors cluster skew —
  * the k knob (see `VectorQueries.NumCentroids`) keeps cells at the
  * target size; a real deployment re-clusters when a cell outgrows it.
  *
  * Pruning happens two ways, both certified:
  *   - static: a literal `centroid_id IN (...)` filter lands in the
  *     scan's `PartitionFilters` (StorageLayoutSpec);
  *   - dynamic: a JOIN on `centroid_id` against a selectively-filtered
  *     query side plans a `dynamicpruning` subquery on the index scan —
  *     the probed cells are only known at runtime, and ONLY they are
  *     read (IvfIndexSpec + the `ann_ivf_pruned` key's plan pin).
  *
  * The build is memoized per (session, path): the index is a SHARED
  * persisted artifact — built once, probed many times — the same
  * accounting contract as `TextQueries.sharedClusters` (the probe keys
  * report marginal probe cost; `warm_cache_keys` in BENCH_DETAIL.json
  * flags them).
  */
object IvfIndex {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** Write `assigned` (any frame carrying `centroid_id`) partitioned by
    * centroid under `path`, once per (session, path); returns `path`.
    * `mode=overwrite` keeps the write idempotent — the content is a
    * deterministic function of the input, so a re-build after session
    * loss lands on identical bytes.
    */
  def ensure(spark: SparkSession, path: String,
             assigned: => DataFrame): String = {
    val it = built.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    built.computeIfAbsent((spark, path), { _ =>
      assigned.write.partitionBy("centroid_id").mode("overwrite").parquet(path)
      path
    })
  }

  /** Drop the memo for `spark` (all paths) — the index files stay on
    * disk; the next [[ensure]] rewrites them.
    */
  def invalidate(spark: SparkSession): Unit = {
    val it = built.keySet.iterator()
    while (it.hasNext) if (it.next()._1 eq spark) it.remove()
  }
}

package graft.streaming

import graft.ops.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the persisted IVF index — the third leg of
  * the index lifecycle, after build ([[graft.ops.IvfIndex.ensure]]) and
  * partition-pruned probe (`ann_ivf_pruned`): vectors arriving on a
  * stream are folded into the index incrementally, LSM-style.
  *
  *   - The BASE table (`<path>`, `centroid_id=<c>/…`) is the immutable
  *     bulk build.
  *   - Each micro-batch assigns its vectors to the FROZEN base centroids
  *     (a map-side broadcast join — the centroid table is k rows; no
  *     shuffle enters the stream) and appends them to a DELTA table
  *     (`<path>_delta`, `batch_id=<b>/centroid_id=<c>/…`).
  *   - Probes read base ∪ delta ([[readIndex]]); `centroid_id` is a
  *     partition column of BOTH tables, so cell pruning (static IN or
  *     dynamic via the probe join) applies to both scans — an append
  *     never degrades probe cost to a corpus scan.
  *
  * Exactly-once lands on the storage layout, not a commit log: the delta
  * is partitioned by `batch_id` FIRST and written with DYNAMIC partition
  * overwrite, so a replayed micro-batch (foreachBatch is at-least-once
  * under crash recovery) rewrites exactly its own `batch_id=<b>`
  * partitions with identical content — byte-level idempotence, the same
  * replay contract `IdempotentMergeSink` provides for merge targets,
  * specialized to append-only data.
  *
  * Frozen centroids mean cell assignment never drifts mid-stream (a
  * batch and a replay of that batch agree by construction). Cells grow
  * as data arrives; when one outgrows the target size — or delta file
  * count makes probes list-bound — [[graft.ops.IvfIndex.compact]]
  * absorbs the delta back into the partitioned base (the classic LSM
  * compaction; at 100 TB a scheduled maintenance pass, not a streaming
  * concern).
  */
object IvfAppendSink {

  /** The foreachBatch body: assign `batch`'s vectors (`idCol`,
    * `vecCol`) to `centroids` (`centroid_id`, `c_emb`) and overwrite the
    * micro-batch's own delta partitions. Precomputes the probe-side norm
    * (`_n`) so probes never touch raw vectors twice — same columns as
    * the base build.
    */
  def appendBatch(indexPath: String, centroids: DataFrame,
                  idCol: String = "vec_id", vecCol: String = "embedding")
                 (batch: DataFrame, batchId: Long): Unit =
    Vectors.assignToCentroids(batch.select(idCol, vecCol), idCol,
        centroids)
      .withColumn("_n", Vectors.norm(col(vecCol)))
      .withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("batch_id", "centroid_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(deltaPath(indexPath))

  /** The probe view: base ∪ delta with identical columns. Both sides are
    * separate parquet scans carrying `centroid_id` as a partition
    * column, so a cell filter or probe join prunes each independently.
    * The delta directory legitimately doesn't exist on a fresh index
    * (no streamed append yet) and right after
    * [[graft.ops.IvfIndex.compact]] absorbs it — then the view is just
    * the base scan.
    */
  def readIndex(spark: SparkSession, indexPath: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = spark.read.parquet(indexPath)
    val dp = new Path(deltaPath(indexPath))
    val fs = dp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dp)) base
    else base.union(
      spark.read.parquet(dp.toString)
        .select(base.columns.map(col).toIndexedSeq: _*))
  }

  /** Delta layout convention — owned by [[graft.ops.IvfIndex]], which
    * also provides the compaction that absorbs it back into base.
    */
  def deltaPath(indexPath: String): String =
    graft.ops.IvfIndex.deltaPath(indexPath)
}

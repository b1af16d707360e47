package graft.streaming

import graft.ops.Quality
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Exactly-once sink semantics from Structured Streaming's at-least-once
  * delivery.
  *
  * The engine's contract: micro-batches arrive with a monotonically
  * increasing `batchId`, offsets are committed to the checkpoint AFTER
  * `foreachBatch` returns — so a crash landing between the sink's write
  * and the offset commit REDELIVERS the same (batchId, data) on restart.
  * A sink is exactly-once iff replaying a batch it already committed is a
  * no-op. This writer gets there the way transactional table formats do:
  * a per-target commit log keyed by batchId, checked before the merge,
  * marked after it.
  *
  * Target layout (plain filesystem, self-describing):
  * {{{
  *   targetDir/snap-<batchId>/   — full merged snapshot written by batch
  *   targetDir/_commits/<batchId> — marker; created AFTER the snapshot
  * }}}
  * The current table is the snapshot of the HIGHEST committed batchId.
  * Every crash window replays safely:
  *   - after marker, before offset commit → replay hits the marker and
  *     skips (THE exactly-once case this sink exists for);
  *   - after snapshot, before marker → replay re-merges from the last
  *     committed snapshot and overwrites the orphan;
  *   - mid-snapshot-write → same as above (overwrite mode).
  *
  * Merge semantics are [[graft.ops.Quality.upsertLatest]] — keep-latest
  * per key by `versionCol` descending — i.e. the same MERGE the
  * oracle-certified `cdc_upsert` batch twin runs, so replaying a batch is
  * ALSO a semantic no-op: merging the same changes twice yields the same
  * table (upsert idempotence backs up the log-based skip).
  *
  * Scale notes: the merge is one full-outer hash join per batch on the
  * key; at 100 TB the snapshot rewrite is what a real deployment replaces
  * with a transactional format's file-level MERGE (Delta/Iceberg), but
  * the idempotence PROTOCOL — batchId log checked first, committed last —
  * is exactly what those formats' `txnAppId`/`txnVersion` implement. The
  * commit check is one filesystem stat; markers are O(1) bytes per batch.
  */
final class IdempotentMergeSink(
    val targetDir: String,
    key: String,
    versionCol: String,
    payload: Seq[String])
  extends ((Dataset[Row], Long) => Unit) with Serializable {

  /** Merge executions actually performed (replays skipped by the commit
    * log don't count) — observability for the replay spec and for
    * monitoring duplicate-delivery rates in production.
    */
  @transient @volatile var mergesRun: Long = 0L

  private def commitsDir = new java.io.File(targetDir, "_commits")
  private def marker(batchId: Long) = new java.io.File(commitsDir, batchId.toString)
  private def snapDir(batchId: Long) = new java.io.File(targetDir, s"snap-$batchId")

  /** Highest committed batchId, or None before the first commit. */
  def lastCommitted(): Option[Long] = {
    val ids = Option(commitsDir.list()).getOrElse(Array.empty)
      .flatMap(n => scala.util.Try(n.toLong).toOption)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** The current merged table (empty-with-schema before any commit). */
  def currentTable(spark: org.apache.spark.sql.SparkSession): DataFrame =
    lastCommitted() match {
      case Some(id) => spark.read.parquet(snapDir(id).toString)
      case None => spark.emptyDataFrame
    }

  override def apply(batch: Dataset[Row], batchId: Long): Unit = {
    if (marker(batchId).exists()) return // replayed delivery: committed, skip
    val spark = batch.sparkSession
    val incoming = batch.select((key +: versionCol +: payload).map(col): _*)
    val base = lastCommitted() match {
      case Some(id) => spark.read.parquet(snapDir(id).toString)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], incoming.schema)
    }
    val merged = Quality.upsertLatest(
        base, incoming, key,
        versionOrder = Seq(col(versionCol).desc), payload = versionCol +: payload)
      .drop("action")
    merged.write.mode("overwrite").parquet(snapDir(batchId).toString)
    mergesRun += 1
    commitsDir.mkdirs()
    // the commit point: marker creation is the atomic "transaction done"
    marker(batchId).createNewFile()
  }
}

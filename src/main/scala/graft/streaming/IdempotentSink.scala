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
  * Target layout (any Hadoop-API filesystem — local, HDFS, S3A;
  * self-describing):
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
  *
  * Storage is bounded: after each commit the sink prunes snapshots (and
  * their markers) older than `retain` batches behind the new commit —
  * best-effort and AFTER the commit point, so a prune failure or crash
  * mid-prune never affects correctness, only defers cleanup to the next
  * batch. `retain` (default 1) keeps a grace window for readers that
  * resolved [[lastCommitted]] just before the commit; marker pruning
  * never perturbs replay-skip because redelivery only ever re-presents
  * the HIGHEST committed batchId (offsets commit per batch), whose
  * marker is always kept. Steady-state footprint: `1 + retain`
  * snapshots, `1 + retain` markers — constant in stream lifetime.
  *
  * With `opCol` set, the feed is full CDC: the latest change per key
  * decides, op `D` removes the key ([[graft.ops.Quality.mergeCdc]] — the
  * `cdc_merge_delete` batch twin); without it, the feed is upsert-only.
  *
  * ==Checkpoint-reset hazard==
  * The commit log is keyed by `batchId`, and batchIds are only meaningful
  * within ONE stream lineage (one checkpoint location). If a stream's
  * checkpoint is deleted — or a fresh query with a fresh checkpoint is
  * pointed at an EXISTING target dir — batchIds restart at 0 while the
  * log still holds the old high ids: new batches would merge against the
  * stale snapshot and commit to ids that [[lastCommitted]] never selects,
  * silently losing them. [[apply]] therefore REFUSES (throws) any
  * batchId below the current [[lastCommitted]] whose marker is absent:
  * the engine only ever redelivers the highest committed batch (offsets
  * commit per batch), so a lower unmarked id can only mean a reset
  * checkpoint or a foreign target dir. Recovery is explicit: point the
  * restarted stream at a fresh target dir, or keep checkpoint and target
  * together.
  */
final class IdempotentMergeSink(
    val targetDir: String,
    key: String,
    versionCol: String,
    payload: Seq[String],
    opCol: Option[String] = None,
    retain: Int = 1)
  extends ((Dataset[Row], Long) => Unit) with Serializable {

  // a negative retain would make prune's keepFrom exceed the batch just
  // committed and delete it — silent total data loss, not a config knob
  require(retain >= 0, s"retain must be >= 0, got $retain")

  /** Merge executions actually performed (replays skipped by the commit
    * log don't count) — observability for the replay spec and for
    * monitoring duplicate-delivery rates in production.
    */
  @transient @volatile var mergesRun: Long = 0L

  // Hadoop FileSystem API, not java.io.File: the same sink then runs
  // against HDFS/S3A/GCS targets on a real cluster — the commit log is
  // a handful of zero-byte objects, well within object-store semantics
  // (the marker create is the only operation that needs atomicity, which
  // every supported FS gives for a single object create).
  private def hadoopFs: org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(targetDir).getFileSystem(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  private def commitsDir = new org.apache.hadoop.fs.Path(targetDir, "_commits")
  private def marker(batchId: Long) =
    new org.apache.hadoop.fs.Path(commitsDir, batchId.toString)
  private def snapDir(batchId: Long) =
    new org.apache.hadoop.fs.Path(targetDir, s"snap-$batchId")

  /** Highest committed batchId, or None before the first commit. */
  def lastCommitted(): Option[Long] = {
    val fs = hadoopFs
    if (!fs.exists(commitsDir)) return None
    val ids = fs.listStatus(commitsDir)
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** The current merged table. Before the FIRST commit this is a
    * schemaless empty frame (the sink cannot know the table schema until
    * it has seen a batch) — callers that select columns must wait for a
    * commit, or carry the schema themselves.
    */
  def currentTable(spark: org.apache.spark.sql.SparkSession): DataFrame =
    lastCommitted() match {
      case Some(id) => spark.read.parquet(snapDir(id).toString)
      case None => spark.emptyDataFrame
    }

  override def apply(batch: Dataset[Row], batchId: Long): Unit = {
    val fs = hadoopFs
    if (fs.exists(marker(batchId))) return // replayed delivery: committed, skip
    // Unmarked batchId BELOW the high-water mark: impossible within one
    // stream lineage (redelivery only re-presents the highest committed
    // batch), so this is a reset checkpoint or a foreign target dir —
    // merging would silently lose every post-reset batch (see scaladoc).
    lastCommitted().filter(_ > batchId).foreach { hwm =>
      throw new IllegalStateException(
        s"IdempotentMergeSink at $targetDir has committed up to batchId=$hwm " +
        s"but received uncommitted batchId=$batchId: the stream's checkpoint " +
        "was reset (or a fresh query reuses an existing target dir). " +
        "Use a fresh target dir, or keep checkpoint and target together.")
    }
    val spark = batch.sparkSession
    val incoming = batch.select(
      (key +: versionCol +: (payload ++ opCol)).map(col): _*)
    // the persisted snapshot never carries the op column — deletes apply,
    // they don't store
    val tableSchema = incoming.drop(opCol.toSeq: _*).schema
    val base = lastCommitted() match {
      case Some(id) => spark.read.parquet(snapDir(id).toString)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], tableSchema)
    }
    val merged = (opCol match {
      case Some(op) => Quality.mergeCdc(
        base, incoming, key,
        versionOrder = Seq(col(versionCol).desc),
        payload = versionCol +: payload, opCol = op)
      case None => Quality.upsertLatest(
        base, incoming, key,
        versionOrder = Seq(col(versionCol).desc), payload = versionCol +: payload)
    }).drop("action")
    merged.write.mode("overwrite").parquet(snapDir(batchId).toString)
    mergesRun += 1
    fs.mkdirs(commitsDir)
    // the commit point: the single-object marker create is the atomic
    // "transaction done" (overwrite=true: a crash after the snapshot but
    // before the marker leaves a replay that redoes the merge and must be
    // able to re-commit)
    fs.create(marker(batchId), true).close()
    prune(fs, batchId)
  }

  /** Delete snapshots and markers more than `retain` batches behind the
    * just-committed `current`. Runs AFTER the commit point and swallows
    * filesystem errors: a crash or failure here leaves extra snapshots
    * that the NEXT successful batch removes — correctness never depends
    * on cleanup having happened.
    */
  private def prune(fs: org.apache.hadoop.fs.FileSystem, current: Long): Unit =
    try {
      val keepFrom = current - retain
      fs.listStatus(new org.apache.hadoop.fs.Path(targetDir)).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("snap-"))
          scala.util.Try(n.stripPrefix("snap-").toLong).toOption
            .filter(_ < keepFrom)
            .foreach(_ => fs.delete(st.getPath, true))
      }
      if (fs.exists(commitsDir)) fs.listStatus(commitsDir).foreach { st =>
        scala.util.Try(st.getPath.getName.toLong).toOption
          .filter(_ < keepFrom)
          .foreach(_ => fs.delete(st.getPath, false))
      }
      ()
    } catch {
      // best-effort by design, but NOT silent: a chronic failure (e.g.
      // permissions on the target dir) would leak a snapshot per batch,
      // unboundedly violating the documented bounded-storage contract —
      // the warn makes that observable while correctness stays unaffected
      case scala.util.control.NonFatal(e) =>
        IdempotentMergeSink.log.warn(
          s"prune failed for $targetDir at batch $current (cleanup deferred " +
          s"to the next batch; storage grows until it succeeds): $e")
    }
}

object IdempotentMergeSink {
  private[streaming] val log =
    org.slf4j.LoggerFactory.getLogger(classOf[IdempotentMergeSink])
}

package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The exactly-once half of the streaming story (CheckpointRecoverySpec
  * is the durability half): Structured Streaming redelivers a micro-batch
  * when a failure lands between the sink's write and the checkpoint's
  * offset commit — at-least-once delivery. This spec OPENS that exact
  * window: the sink commits batch 1, then the query is killed before the
  * engine can commit offsets; the restarted query replays batch 1 with
  * the same batchId and data, and the target must show no duplicate rows
  * and no double-applied merge.
  */
class IdempotentSinkSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("replayed batch after kill-between-sink-commit-and-checkpoint is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_idem_ckpt").toString
    val target = java.nio.file.Files
      .createTempDirectory("graft_idem_target").toString
    val mem = MemoryStream[(Long, Long, String)]
    val sink = new IdempotentMergeSink(target, "k", "v", Seq("payload"))

    // fail AFTER the sink committed the batch, BEFORE the engine commits
    // offsets — the redelivery window a non-idempotent sink double-writes in
    @volatile var failAt = -1L
    def start() = mem.toDS().toDF("k", "v", "payload")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(batch, batchId)
        if (batchId == failAt) {
          failAt = -1L
          throw new RuntimeException("injected crash after sink commit")
        }
      }
      .start()

    val q1 = start()
    try {
      mem.addData((1L, 1L, "a"), (2L, 1L, "b"))
      q1.processAllAvailable()
      failAt = 1L
      mem.addData((1L, 2L, "a2"), (3L, 1L, "c"))
      intercept[Exception] { q1.processAllAvailable() } // the injected kill
    } finally q1.stop()
    assert(sink.lastCommitted().contains(1L),
      "sink must have committed batch 1 before the crash")
    assert(sink.mergesRun == 2)

    // restart: the engine REPLAYS batch 1 (same id, same data) — the
    // commit log must skip it; then the stream continues with batch 2
    val q2 = start()
    try {
      q2.processAllAvailable() // drains the replay of batch 1
      assert(sink.mergesRun == 2, "replayed batch re-ran the merge")
      mem.addData((2L, 2L, "b2"))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = sink.currentTable(spark)
      .select("k", "v", "payload").as[(Long, Long, String)]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, 2L, "a2"), (2L, 2L, "b2"), (3L, 1L, "c")),
      s"merge result wrong or duplicated: ${rows.toSeq}")
    // exactly-once: one row per key even though batch 1 was delivered twice
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(sink.mergesRun == 3) // batches 0, 1, 2 — each merged exactly once
  }

  test("CDC mode: deletes apply across micro-batches, re-insert revives") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_idem_cdc_ckpt").toString
    val target = java.nio.file.Files
      .createTempDirectory("graft_idem_cdc_target").toString
    val mem = MemoryStream[(Long, Long, String, String)]
    val sink = new IdempotentMergeSink(target, "k", "v", Seq("payload"),
      opCol = Some("op"))
    val q = mem.toDS().toDF("k", "v", "payload", "op")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch(sink).start()
    try {
      mem.addData((1L, 1L, "a", "U"), (2L, 1L, "b", "U"))
      q.processAllAvailable()
      mem.addData((1L, 2L, "x", "D"), (3L, 1L, "c", "U")) // delete key 1
      q.processAllAvailable()
      assert(sink.currentTable(spark).filter($"k" === 1L).count() == 0,
        "delete did not remove the key from the snapshot")
      mem.addData((1L, 3L, "a3", "U")) // revive after delete
      q.processAllAvailable()
    } finally q.stop()
    val rows = sink.currentTable(spark)
      .select("k", "v", "payload").as[(Long, Long, String)]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 3L, "a3"), (2L, 1L, "b"), (3L, 1L, "c")),
      s"CDC merge wrong: ${rows.toSeq}")
    // the snapshot never stores the op column
    assert(!sink.currentTable(spark).columns.contains("op"))
  }

  test("checkpoint reset against an existing target fails loudly, not silently") {
    // THE data-loss hazard of a batchId-keyed commit log: delete the
    // stream's checkpoint (or point a fresh query at an old target) and
    // batchIds restart at 0 while the log still holds the old high ids.
    // Without the guard the post-reset batches merge against the stale
    // snapshot and commit to ids lastCommitted() never selects — silent
    // loss. The sink must refuse an UNMARKED batchId below the high-water
    // mark (a marked one is the legitimate replay-skip, preserved here).
    val target = java.nio.file.Files
      .createTempDirectory("graft_idem_reset_target").toString
    val sink = new IdempotentMergeSink(target, "k", "v", Seq("payload"))
    def batch(rows: (Long, Long, String)*) = rows.toDF("k", "v", "payload")
    // drive the sink directly: apply() is the whole foreachBatch contract
    (0L to 3L).foreach(id => sink(batch((id, id, s"p$id")), id))
    assert(sink.lastCommitted().contains(3L))
    assert(sink.mergesRun == 4)

    // replay of the high-water batch (the only id the engine redelivers
    // within one lineage) still skips silently — guard must not break it
    sink(batch((3L, 3L, "p3")), 3L)
    assert(sink.mergesRun == 4, "marked replay must stay a no-op")

    // the reset: a fresh checkpoint restarts at batchId 0, whose marker
    // retain=1 pruning already removed — must throw, not merge-and-lose
    val e = intercept[IllegalStateException] { sink(batch((9L, 9L, "x")), 0L) }
    assert(e.getMessage.contains("checkpoint"),
      s"error must name the checkpoint-reset cause: ${e.getMessage}")
    // and the table is untouched by the refused batch
    assert(sink.lastCommitted().contains(3L))
    assert(sink.currentTable(spark).filter($"k" === 9L).count() == 0)
  }

  test("incremental stream merge equals the one-shot batch MERGE") {
    // the parity that makes the sink trustworthy: folding the change feed
    // batch-by-batch through the sink must land on EXACTLY the table the
    // oracle-certified batch upsert computes over the whole feed at once
    // (keep-latest by version is associative when versions are unique)
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_idem_parity_ckpt").toString
    val target = java.nio.file.Files
      .createTempDirectory("graft_idem_parity_target").toString
    import org.apache.spark.sql.functions.col
    val changes = graft.etl.Readers.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id").as("k"), col("event_id").as("v"),
        col("value").as("payload"))
      .as[(Long, Long, Double)].collect().toSeq

    val mem = MemoryStream[(Long, Long, Double)]
    val sink = new IdempotentMergeSink(target, "k", "v", Seq("payload"))
    val q = mem.toDS().toDF("k", "v", "payload")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch(sink).start()
    try {
      changes.grouped(math.max(1, changes.size / 5)).foreach { c =>
        mem.addData(c: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val incoming = changes.toDF("k", "v", "payload")
    val oneShot = graft.ops.Quality.upsertLatest(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          incoming.schema),
        incoming, "k",
        versionOrder = Seq(col("v").desc), payload = Seq("v", "payload"))
      .drop("action")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val streamed = sink.currentTable(spark)
      .select("k", "v", "payload")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(streamed.length == oneShot.length && streamed.nonEmpty)
    assert(streamed.toSeq == oneShot.toSeq,
      s"incremental fold diverged from the one-shot MERGE " +
        s"(${streamed.length} vs ${oneShot.length} rows)")

    // storage is bounded: after 5+ committed batches only the newest
    // 1 + retain (default retain=1 → 2) snapshots and markers survive
    // pruning — without it the target grows as table-size × batch-count
    val targetLs = new java.io.File(target).listFiles().map(_.getName)
    val snaps = targetLs.filter(_.startsWith("snap-"))
      .map(_.stripPrefix("snap-").toLong).sorted
    // Hadoop's checksumming local FS shadows each marker with a .crc file
    val markers = new java.io.File(target, "_commits").listFiles()
      .flatMap(f => scala.util.Try(f.getName.toLong).toOption).sorted
    // EXACT set, not an upper bound: over-pruning (deleting the retain=1
    // grace snapshot readers may still hold) must fail too
    val newest = markers.max
    assert(snaps.toSeq == Seq(newest - 1, newest),
      s"expected exactly snapshots ${newest - 1},$newest — got " +
        snaps.mkString(","))
    assert(markers.toSeq == Seq(newest - 1, newest),
      s"expected exactly markers ${newest - 1},$newest — got " +
        markers.mkString(","))
  }
}

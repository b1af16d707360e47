package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The production ingest path end-to-end, with REAL files instead of
  * MemoryStream: a JSONL landing directory tailed by
  * [[DocStreams.fromJsonlDir]] (FileStreamSource: each trigger processes
  * only files the checkpoint's file log has not committed), curated by
  * the shared quality+dedup rules, and merged exactly-once by
  * [[IdempotentMergeSink]]. Pins the three contracts MemoryStream specs
  * cannot: incremental FILE discovery (a file dropped mid-stream is
  * picked up without restart), file-log recovery (a restart does not
  * re-process committed files), and the PERMISSIVE quarantine (a corrupt
  * line becomes a `_corrupt_record` row, never a stream failure).
  */
class FileIngestSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("ts", TimestampType)))

  private def sentence(prefix: String): String =
    (1 to 20).map(i => s"$prefix$i").mkString(" ") + " the and of it"

  private def jline(id: Long, text: String, s: Int): String =
    s"""{"doc_id": $id, "text": "$text", "ts": "2026-01-01T00:00:0$s"}"""

  private def drop(dir: String, name: String, lines: Seq[String]): Unit = {
    // write-then-rename: the file must never be LISTED half-written (the
    // same discipline a real crawler needs against a streaming tail)
    val tmp = java.nio.file.Paths.get(dir, s".$name.tmp")
    java.nio.file.Files.write(tmp,
      lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  test("files are discovered incrementally, curated, and merged exactly once") {
    val land = java.nio.file.Files.createTempDirectory("graft_land").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_land_ck").toString
    val target = java.nio.file.Files.createTempDirectory("graft_land_t").toString
    val sink = new IdempotentMergeSink(target, "doc_id", "ts", Seq("text"))
    // rows DELIVERED to the sink across the stream's whole life — the
    // file-log assertion below needs "no f1/f2 row ever re-arrives", which
    // the idempotent merge would otherwise mask
    val delivered = new java.util.concurrent.atomic.AtomicLong(0)

    def start() = DocStreams.curated(
        DocStreams.fromJsonlDir(spark, land, schema)
          .filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
        watermark = "24 hours")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        delivered.addAndGet(b.count()); sink(b, id)
      }
      .start()

    drop(land, "f1.jsonl", Seq(
      jline(1, sentence("alpha"), 1),
      jline(2, "too short and junk", 2))) // quality-rejected
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(sink.currentTable(spark).select("doc_id").as[Long].collect()
        .toSet === Set(1L))

      // a file dropped while the query runs is picked up without restart;
      // doc 3 is a case-variant duplicate of doc 1 from the EARLIER file -
      // the fingerprint state crosses micro-batches
      drop(land, "f2.jsonl", Seq(
        jline(3, sentence("alpha").replace("alpha7", "ALPHA7"), 3),
        jline(4, sentence("beta"), 4)))
      q1.processAllAvailable()
      assert(sink.currentTable(spark).select("doc_id").as[Long].collect()
        .toSet === Set(1L, 4L))
    } finally q1.stop()
    val deliveredBeforeRestart = delivered.get()

    // restart from the same checkpoint: the file log must NOT re-process
    // f1/f2 — across the restart exactly ONE new row (doc 5) may arrive
    drop(land, "f3.jsonl", Seq(jline(5, sentence("gamma"), 5)))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(sink.currentTable(spark).select("doc_id").as[Long].collect()
        .toSet === Set(1L, 4L, 5L))
      assert(delivered.get() === deliveredBeforeRestart + 1,
        "restart re-delivered rows from files already in the checkpoint's file log")
    } finally q2.stop()
  }

  test("a corrupt line becomes a quarantine row, not a stream failure") {
    val land = java.nio.file.Files.createTempDirectory("graft_quar").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_quar_ck").toString
    drop(land, "f1.jsonl", Seq(
      jline(1, sentence("alpha"), 1),
      """{not json at all""",
      jline(2, sentence("beta"), 2)))
    val q = DocStreams.fromJsonlDir(spark, land, schema)
      .withColumn("corrupt", col("_corrupt_record").isNotNull)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("graft_quarantine_probe")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("graft_quarantine_probe")
        .select("doc_id", "corrupt").as[(Option[Long], Boolean)]
        .collect().toSet
      assert(rows === Set((Some(1L), false), (Some(2L), false), (None, true)))
    } finally q.stop()
  }
}

package graft.streaming

import graft.TestSpark
import graft.ops.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class Doc(doc_id: Long, text: String, ts: Timestamp)

class DocStreamsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val fluent = "the quick brown fox jumps over a lazy dog and " +
    "then it runs far away to find more food for the winter season now"

  test("curated stream: quality-rejects dropped, in-horizon content dups dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    mem.addData(
      Doc(1L, fluent, ts("2024-01-01 00:00:00")),
      Doc(2L, "too short", ts("2024-01-01 00:01:00")),       // quality reject
      Doc(3L, fluent, ts("2024-01-01 00:05:00")),            // content dup of 1
      Doc(4L, fluent + " extra", ts("2024-01-01 00:10:00"))) // novel, keeps
    val q = DocStreams.curated(mem.toDF())
      .writeStream.format("memory").queryName("curated_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("curated_test")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 4L))
    } finally q.stop()
  }

  test("stream/batch parity: streamed keep set equals batch qualityFilter keeps") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      Doc(1L, fluent, ts("2024-01-01 00:00:00")),
      Doc(2L, "short", ts("2024-01-01 00:01:00")),
      Doc(3L, Seq.fill(30)("word").mkString(" "), ts("2024-01-01 00:02:00")),
      Doc(4L, (1 to 30).map(i => s"w$i").mkString(" "), ts("2024-01-01 00:03:00")),
      Doc(5L, fluent + " differs", ts("2024-01-01 00:04:00")))
    val mem = MemoryStream[Doc]
    mem.addData(docs: _*)
    val q = DocStreams.qualityFiltered(mem.toDF())
      .writeStream.format("memory").queryName("qf_parity_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("qf_parity_test")
        .select("doc_id").as[Long].collect().toSet
      val batch = Curation.qualityFilter(docs.toDF(), "doc_id", "text")
        .filter(col("keep")).select("doc_id").as[Long].collect().toSet
      assert(streamed == batch && batch == Set(1L, 5L))
    } finally q.stop()
  }
}

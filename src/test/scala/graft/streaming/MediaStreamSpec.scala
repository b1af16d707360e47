package graft.streaming

import graft.TestSpark
import graft.ops.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal ingest under Structured Streaming: the SAME
  * quarantine-routing decoder ([[Multimodal.extractFeaturesSafe]], a
  * deterministic mapPartitions) runs unchanged over a stream — corrupt
  * containers become ok=false rows in the same micro-batch, never a
  * failed query, which is the property that keeps a continuous media
  * feed alive. Batch/streaming parity by construction: one decode path.
  */
class MediaStreamSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("streamed decode routes corrupt containers to quarantine rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = Multimodal.extractFeaturesSafe(
        mem.toDS().toDF("media_id", "media"))
      .writeStream.format("memory").queryName("media_stream")
      .outputMode("append").start()
    try {
      val good = Multimodal.encodePng("clean frame".getBytes("UTF-8"))
      val bad = good.clone(); bad(0) = 0 // break the signature
      mem.addData((1L, good), (2L, bad))
      q.processAllAvailable()
      mem.addData((3L, good.clone()))
      q.processAllAvailable()
      val rows = spark.table("media_stream")
        .orderBy("media_id").collect()
      assert(rows.length == 3)
      assert(rows(0).getBoolean(1) && rows(2).getBoolean(1))
      assert(!rows(1).getBoolean(1) &&
        rows(1).getString(2).contains("signature"))
      // decoded features present for the clean rows
      assert(rows(0).getLong(3) == rows(2).getLong(3)) // same raster size
    } finally q.stop()
  }
}

package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class EmbRow(vec_id: Long, embedding: Array[Float], ts: Timestamp)

/** Streaming embedding dedup ([[EmbeddingStreams.dedupBySignature]]):
  * batch/stream parity on real embeddings, in-horizon near-dup drops,
  * and watermark eviction of bucket state (the bounded-memory contract).
  */
class EmbeddingStreamsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // real corpus vectors, arrival-ordered by vec_id with distinct minutes
  // so "first arrival" is unambiguous on both sides of the parity check
  private lazy val corpus: Seq[EmbRow] = {
    val base = ts("2024-01-01 00:00:00").getTime
    graft.etl.Readers.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1).toSeq
      .map { case (id, e) => EmbRow(id, e, new Timestamp(base + id * 60000L)) }
  }

  test("stream keep set equals the batch first-per-signature keep set") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EmbRow]
    // horizon covers the whole feed (arrival minutes span ~8h): parity
    // with the horizonless batch twin is exact only while nothing
    // evicts — eviction behavior has its own test below
    val q = EmbeddingStreams.dedupBySignature(mem.toDF(), watermark = "24 hours")
      .writeStream.format("memory").queryName("emb_dedup_parity")
      .outputMode("append").start()
    try {
      // two chunks: dedup must hold across micro-batch boundaries too
      corpus.grouped(math.max(1, corpus.size / 2)).foreach { c =>
        mem.addData(c: _*); q.processAllAvailable()
      }
      val streamed = spark.table("emb_dedup_parity")
        .select("vec_id").as[Long].collect().toSet
      // batch twin: the SAME signature expression, first arrival per
      // bucket — what the batch LSH pipeline's keep-first decision emits
      val w = Window.partitionBy("sig").orderBy("ts", "vec_id")
      val batch = corpus.toDF()
        .withColumn("sig",
          graft.ops.Vectors.lshSignature(col("embedding"), 8, 64))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("vec_id").as[Long].collect().toSet
      assert(streamed == batch,
        s"stream kept ${streamed.size}, batch kept ${batch.size}; " +
          s"diff=${(streamed diff batch) ++ (batch diff streamed)}")
      // the fixture actually exercises dedup: buckets collapse something
      assert(batch.size < corpus.size,
        "degenerate fixture: every vector in its own bucket")
    } finally q.stop()
  }

  test("in-horizon same-bucket arrival drops; post-eviction one re-admits") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EmbRow]
    val q = EmbeddingStreams
      .dedupBySignature(mem.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("emb_dedup_evict")
      .outputMode("append").start()
    try {
      val v = corpus.head.embedding
      mem.addData(EmbRow(100L, v, ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // same vector (identical signature) 10 min later: in horizon → drop
      mem.addData(EmbRow(101L, v, ts("2024-01-01 00:10:00")))
      q.processAllAvailable()
      // advance the watermark far past the horizon, in a DIFFERENT bucket
      // (negated vector flips every hyperplane sign)
      mem.addData(EmbRow(102L, v.map(-_), ts("2024-01-01 06:00:00")))
      q.processAllAvailable()
      // bucket state for v was evicted → the same signature re-admits;
      // this is the bounded-state trade the scaladoc names (the batch
      // reconciliation pass owns cross-horizon dups)
      mem.addData(EmbRow(103L, v, ts("2024-01-01 06:10:00")))
      q.processAllAvailable()
      val kept = spark.table("emb_dedup_evict")
        .select("vec_id").as[Long].collect().toSet
      assert(kept == Set(100L, 102L, 103L),
        s"expected in-horizon drop of 101 and post-eviction keep of 103, got $kept")
    } finally q.stop()
  }
}

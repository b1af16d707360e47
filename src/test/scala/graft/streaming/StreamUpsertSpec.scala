package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.etl.Sink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming-CDC-into-a-table pattern: a change stream applied to a
  * persisted keyed table via foreachBatch + [[Sink.mergeByKey]] — the
  * standard "no lakehouse format available" upsert loop (with Delta or
  * Iceberg the foreachBatch body becomes MERGE INTO; the stream wiring is
  * identical). Within-batch duplicate keys are collapsed keep-latest
  * BEFORE the merge, honoring mergeByKey's unique-key contract.
  */
class StreamUpsertSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch + mergeByKey maintains a keyed table across batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-upsert").toString
    val table = s"$dir/state"
    // seed table: keys 1, 2
    Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("k", "v", "ver")
      .write.mode("overwrite").parquet(table)

    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("k", "v", "ver")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val latest = batch
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
              .orderBy(col("ver").desc)))
          .filter(col("__rn") === 1).drop("__rn")
        val existing = spark.read.parquet(table)
        // write-then-swap: read fully materialized before overwrite
        val merged = Sink.mergeByKey(existing, latest, Seq("k")).collect()
        spark.createDataFrame(
            spark.sparkContext.parallelize(merged.toIndexedSeq),
            existing.schema)
          .write.mode("overwrite").parquet(table)
        ()
      }
      .start()
    try {
      // batch 1: update key 2 (two versions — latest must win), insert 3
      mem.addData((2L, "b1", 1L), (2L, "b2", 2L), (3L, "c", 1L))
      q.processAllAvailable()
      // batch 2: update key 1
      mem.addData((1L, "a9", 9L))
      q.processAllAvailable()

      val state = spark.read.parquet(table)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(state == Seq((1L, "a9", 9L), (2L, "b2", 2L), (3L, "c", 1L)))
    } finally q.stop()
  }
}

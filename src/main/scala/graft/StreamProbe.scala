package graft

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Dev tool: isolates Structured Streaming's fixed micro-batch overhead
  * from op cost. Runs the smallest possible stateful query (global count
  * of a 3-int batch) and prints per-batch wall times, so framework cost
  * (incremental re-plan, offset/commit WAL, state commit, no-data batch)
  * is measured with ZERO op work. Compare `SPARK_GRAFT_CPUS`, checkpoint
  * medium (arg 1: checkpoint root), and batch count (arg 2).
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val root = if (args.nonEmpty) args(0) else "/dev/shm/graft-streamprobe"
    val batches = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSessions.localFromEnv(defaultCpus = "32")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext

    def probe(tag: String, partitions: Int, stateful: Boolean): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
      val mem = MemoryStream[Int]
      val base = mem.toDS()
      val out =
        if (stateful) base.groupBy().agg(count(lit(1)).as("n"))
        else base.select((col("value") + 1).as("v"))
      val q = out.writeStream.format("noop")
        .outputMode(if (stateful) "update" else "append")
        .option("checkpointLocation", s"$root/${System.nanoTime()}")
        .start()
      val times = (1 to batches).map { i =>
        val t0 = System.nanoTime()
        mem.addData(i, i + 1, i + 2)
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      q.stop()
      println(s"probe[$tag] batch secs: " +
        times.map(t => f"$t%.2f").mkString(", "))
    }
    probe("stateless p8", 8, stateful = false)
    probe("count p1", 1, stateful = true)
    probe("count p8", 8, stateful = true)
    probe("count p32", 32, stateful = true)
    spark.stop()
  }
}

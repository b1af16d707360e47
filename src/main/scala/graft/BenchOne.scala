package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one named SparkEntry query N times against a sf dir.
  * Usage: runMain graft.BenchOne <name> [reps] [sfDir]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSessions.localFromEnv(defaultCpus = "32")
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    // same host-speed yardstick as Bench: numbers are only comparable
    // across rounds when cal ≈ 0.1 (healthy local[32])
    import org.apache.spark.sql.functions.{sum, xxhash64, col, lit}
    def calibrate(tag: String): Unit = {
      val t0 = System.nanoTime()
      spark.range(0L, 200000000L, 1L, 32)
        .select(sum(xxhash64(col("id")).bitwiseAND(lit(0xFFFFFFFFL)))).collect()
      println(f"[benchone] cal($tag): ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    calibrate("jit-warmup") // first run compiles the yardstick itself
    calibrate("before")
    for (i <- 0 until reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[benchone] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    calibrate("after")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * A warmup pass runs the whole suite once first so the recorded numbers are
  * steady-state engine throughput (JIT, codegen cache, file-footer cache)
  * rather than JVM startup — the same protocol any engine benchmark uses.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSessions.localFromEnv()
    spark.sparkContext.setLogLevel("ERROR")

    val suite = SparkEntry.queries.toSeq.sortBy(_._1)
    // a failed query must not masquerade as a fast one: its timing is
    // recorded as -1 and its name lands in the "failed" list
    def runAll(): (Map[String, Double], Seq[String]) = {
      val failed = scala.collection.mutable.ListBuffer[String]()
      val times = suite.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink forces full evaluation of every column (a count() lets
        // Catalyst prune the whole projection and under-reports the work).
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            failed += name
            false
          }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }.toMap
      (times, failed.toSeq)
    }

    runAll() // warmup
    // two timed passes, per-query MIN: this host shows multi-second
    // CPU-contention bursts that land on random queries; the min of two
    // steady-state passes is the engine's actual throughput, the mean of
    // one pass is a lottery
    val (r1, f1) = runAll()
    val (r2, f2) = runAll()
    val results = r1.map { case (k, v) =>
      k -> (if (v < 0 || r2(k) < 0) -1.0 else math.min(v, r2(k)))
    }
    val failed = (f1 ++ f2).distinct
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}

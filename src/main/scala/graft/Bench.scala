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
    // three timed passes, per-query MIN plus the max for spread: this host
    // shows multi-second CPU-contention bursts that land on random queries,
    // and C2 JIT keeps improving hot paths past the warmup pass — r2's
    // min-of-two recorded join_left at 2.7x its steady state purely from
    // that. The min of three steady-state passes is the engine's actual
    // throughput; the max makes contention attributable instead of
    // masquerading as a plan regression.
    val passes = Seq(runAll(), runAll(), runAll())
    val failed = passes.flatMap(_._2).distinct
    val perQuery = suite.map { case (name, _) =>
      val vs = passes.map(_._1(name))
      name -> (if (vs.exists(_ < 0)) (-1.0, -1.0) else (vs.min, vs.max))
    }
    // The harness keeps only the LAST ~2000 chars of output and parses the
    // JSON line it finds there, so the final line must be (a) the last thing
    // printed and (b) compact enough — 3-decimal mins, no max map — that the
    // whole line survives the tail window even as the suite grows. The
    // full-precision min/max detail goes on its own '#'-prefixed line (never
    // parseable as JSON, so it can't be mistaken for the headline).
    def f3(v: Double): String = {
      val s = "%.3f".format(v)
      // trim trailing zeros ("0.150"->"0.15", "2.000"->"2") — every char
      // counts against the 2000-char tail window
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
    }
    val detail = perQuery
      .map { case (k, (mn, mx)) => "\"" + k + "\":[" + mn + "," + mx + "]" }
      .mkString("{", ",", "}")
    println(s"# bench-detail(min,max) $detail")
    val qs = perQuery
      .map { case (k, (mn, _)) => "\"" + k + "\":" + f3(mn) }
      .mkString("{", ",", "}")
    val total = perQuery.collect { case (_, (mn, _)) if mn >= 0 => mn }.sum
    val failedJson =
      if (failed.isEmpty) "" // omit when clean: chars count against the tail window
      else ",\"failed\":" + failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs$failedJson,"sf":"${sfDir.split('/').last}"}"""
    // stop() first: its shutdown logging (stderr) must not land after the line.
    spark.stop()
    println(line)
    System.out.flush()
  }
}

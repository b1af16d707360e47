package graft.tools

import graft.{SparkEntry, SparkSessions}

/** Dev tool: write `.explain("formatted")` output for named queries to
  * files — the plan evidence the optimization-round deliverables require
  * (`plans/r<N>/<query>_{before,after}.txt`). Construction-only: the
  * formatted explain of the initial plan, no execution.
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <q1,q2,...> [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[explain] wrote $outDir/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}

package graft.tools

import graft.{SparkEntry, SparkSessions}

/** Dev tool: print the executed plan of one or more named queries (after
  * a collect so AQE has finalized each). Usage: runMain
  * graft.tools.PlanProbe <q1[,q2,...]> [sfDir]. With several names, only
  * the per-query summary line prints (full plan on single-name runs).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute the df's OWN QueryExecution (a noop write would plan a fresh
      // one) so the AdaptiveSparkPlan below is the FINAL plan with runtime
      // stage reuse visible
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      if (names.size == 1) println(plan)
      // strip the tree-prefix characters (+- :- : |) so Exchange nodes in
      // non-last join/union branches (rendered ":- Exchange") count too
      def op(line: String): String = line.dropWhile(c => "+-:| ".contains(c))
      println(s"[probe] $name: exchanges=" +
        plan.split("\n").count(l => op(l).startsWith("Exchange ")) +
        " reused=" + plan.split("\n").count(_.contains("ReusedExchange")) +
        " scans=" + plan.split("\n").count(_.contains("Scan parquet")) +
        " rddscans=" + plan.split("\n").count(_.contains("Scan ExistingRDD")))
    }
    spark.stop()
  }
}

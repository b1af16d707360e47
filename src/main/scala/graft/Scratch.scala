package graft

/** Dev scratchpad for plan/perf experiments. Not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      val sortAggs = plan.split("\n").count(_.contains("SortAggregate"))
      val bnlj = plan.split("\n").count(_.contains("BroadcastNestedLoopJoin"))
      val cartesian = plan.split("\n").count(_.contains("CartesianProduct"))
      if (sortAggs + bnlj + cartesian > 0)
        println(s"[audit] $name: sortAgg=$sortAggs bnlj=$bnlj cartesian=$cartesian")
    }
    println("[audit] done")
    spark.stop()
  }
}

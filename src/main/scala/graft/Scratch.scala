package graft
import org.apache.spark.sql.SparkSession

/** Dev scratchpad for plan/perf experiments. Not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")

    for (name <- Seq("join_semi_anti", "join_asof", "topk_per_group",
        "join_range", "sliding_window", "ann_lsh_probe")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $name")
      println(df.queryExecution.executedPlan.toString.split("\n")
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Aggregate") || l.contains("Window") || l.contains("Sort ") ||
          l.contains("Generate") || l.contains("Scan parquet"))
        .mkString("\n"))
    }
    spark.stop()
  }
}

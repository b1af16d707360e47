package graft.tools

import graft.{SparkEntry, SparkSessions}
import graft.plans.PlanLint

/** Dev tool: run [[PlanLint]] over every `SparkEntry.queries` key (or a
  * comma-separated subset) and print one line per finding. Construction
  * only — no query executes, so the whole 208-key sweep costs seconds.
  * Usage: runMain graft.tools.LintProbe [sfDir] [subset]
  */
object LintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val subset: Set[String] =
      if (args.length > 1) args(1).split(",").toSet else Set.empty
    val spark = SparkSessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val keys = SparkEntry.queries.keys.toSeq.sorted
      .filter(k => subset.isEmpty || subset.contains(k))
    var flagged = 0
    for (name <- keys) {
      val findings =
        try PlanLint.lint(SparkEntry.queries(name)(spark, sfDir))
        catch {
          case e: Throwable =>
            Seq(PlanLint.Finding("probe-error", "-", e.toString.take(120)))
        }
      if (findings.nonEmpty) {
        flagged += 1
        findings.foreach(f => println(s"LINT $name $f"))
      }
    }
    println(s"LINT-SUMMARY flagged=$flagged of ${keys.size}")
    spark.stop()
  }
}

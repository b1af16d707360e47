package graft.tools

import graft.{SparkEntry, SparkSessions}
import graft.plans.PlanLint
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}

/** Dev tool (r17 optimization round): construction-only plan census over
  * every `SparkEntry.queries` key — the mechanical form of the
  * exchange-reuse audit. For each key's INITIAL physical plan it prints
  *
  *   - scans: FileSourceScan count per table (a table scanned N>1 times
  *     in one plan is N passes over the data unless a later AQE stage
  *     reuse covers it — which only happens when the whole subtree UNDER
  *     an exchange is canonically identical);
  *   - ex / reuse: Exchange vs ReusedExchange counts;
  *   - gen / win / sortagg: Generate (explode), Window, SortAggregate
  *     counts — the per-row-expensive operators;
  *   - dup: the LARGEST canonically-duplicated subtree (node count ×
  *     occurrences) that is NOT under a ReusedExchange — the shape AQE
  *     stage reuse cannot dedupe when the consumers key their exchanges
  *     differently (the r16 duplicate-window-function finding, one level
  *     up — VERDICT r16 #4).
  *
  * Usage: runMain graft.tools.PlanSurvey [sfDir] [subset]
  */
object PlanSurvey {

  final case class Census(scans: Map[String, Int], exchanges: Int,
                          reused: Int, generates: Int, windows: Int,
                          sortAggs: Int, joins: Map[String, Int],
                          dupSize: Int, dupCount: Int, dupHead: String)

  def census(plan: SparkPlan): Census = {
    var ex, reuse, gen, win, sortAgg = 0
    val scans = scala.collection.mutable.Map[String, Int]()
    val joins = scala.collection.mutable.Map[String, Int]()
    plan.foreach {
      case s: FileSourceScanExec =>
        val t = s.relation.location.rootPaths.headOption
          .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
        scans(t) = scans.getOrElse(t, 0) + 1
      case _: ReusedExchangeExec => reuse += 1
      case _: Exchange => ex += 1
      case g if g.nodeName.contains("Generate") => gen += 1
      case w if w.nodeName == "Window" || w.nodeName == "WindowGroupLimit" =>
        win += 1
      case a if a.nodeName.startsWith("SortAggregate") => sortAgg += 1
      case j if j.nodeName.endsWith("Join") || j.nodeName == "CartesianProduct" =>
        joins(j.nodeName) = joins.getOrElse(j.nodeName, 0) + 1
      case _ =>
    }
    // duplicated canonical subtrees ≥4 nodes, not under a ReusedExchange:
    // collect every subtree's canonicalized form with its size, group, and
    // keep the biggest duplicated one. Skip subtrees of a ReusedExchange
    // (there are none in an initial plan, but be safe) and leaf-ish nodes.
    val counts = scala.collection.mutable.Map[SparkPlan, (Int, Int)]()
    def walk(p: SparkPlan): Int = {
      val size = 1 + p.children.map(walk).sum
      if (size >= 4) {
        val c = p.canonicalized
        val (n, _) = counts.getOrElse(c, (0, size))
        counts(c) = (n + 1, size)
      }
      size
    }
    walk(plan)
    val dups = counts.filter(_._2._1 > 1)
    val top = if (dups.isEmpty) null
              else dups.maxBy { case (_, (n, size)) => size }
    Census(scans.toMap, ex, reuse, gen, win, sortAgg, joins.toMap,
      if (top == null) 0 else top._2._2,
      if (top == null) 0 else top._2._1,
      if (top == null) "" else top._1.nodeName)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val subset: Set[String] =
      if (args.length > 1) args(1).split(",").toSet else Set.empty
    val spark = SparkSessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val keys = SparkEntry.queries.keys.toSeq.sorted
      .filter(k => subset.isEmpty || subset.contains(k))
    for (name <- keys) {
      try {
        val c = census(PlanLint.initialPlan(
          SparkEntry.queries(name)(spark, sfDir)))
        val scanStr = c.scans.toSeq.sortBy(-_._2)
          .map { case (t, n) => s"$t=$n" }.mkString(",")
        val joinStr = c.joins.toSeq.sortBy(-_._2)
          .map { case (t, n) => s"$t=$n" }.mkString(",")
        println(s"SURVEY $name scans[$scanStr] ex=${c.exchanges} " +
          s"reuse=${c.reused} gen=${c.generates} win=${c.windows} " +
          s"sortagg=${c.sortAggs} joins[$joinStr] " +
          s"dup=${c.dupCount}x${c.dupSize}n(${c.dupHead})")
      } catch {
        case e: Throwable =>
          println(s"SURVEY $name ERROR ${e.toString.take(120)}")
      }
    }
    spark.stop()
  }
}

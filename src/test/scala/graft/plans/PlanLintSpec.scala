package graft.plans

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[PlanLint]] certification, in three layers:
  *
  *  1. each rule FIRES on a deliberately bad plan (so the sweep below
  *     can't pass by the linter being blind);
  *  2. the bounded-cardinality prover accepts exactly the shapes it
  *     claims to (global aggregates, limits, their compositions) and
  *     refuses scans, keyed aggregates, and row-expanding operators;
  *  3. the suite-wide sweep: EVERY `SparkEntry.queries` key lints clean
  *     of 100 TB anti-patterns, modulo a per-key allowlist whose entries
  *     each carry the boundedness argument the linter cannot see
  *     statically — and every allowlist entry must actually fire, so
  *     fixed queries shed their entries instead of keeping blanket
  *     immunity.
  *
  * Linting is construction-only (initial plan, pre-AQE), so the 208-key
  * sweep costs seconds, not a suite execution.
  */
class PlanLintSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def orders: DataFrame =
    graft.etl.Readers.table(spark, sfDir, "orders")
  private def nation: DataFrame =
    graft.etl.Readers.table(spark, sfDir, "nation")

  private def rules(df: DataFrame): Set[String] =
    PlanLint.lint(df).map(_.rule).toSet

  // ---- layer 1: rules fire on deliberately bad plans ----

  test("cartesian-product fires on a forced replicate-NL cross join") {
    val bad = orders.hint("shuffle_replicate_nl").crossJoin(nation)
    assert(rules(bad).contains(PlanLint.CartesianProduct))
  }

  test("nested-loop-join fires on an unbounded broadcast side, not on a proven one") {
    // nation is a SCAN — nothing bounds it statically, even though the
    // table happens to be small: the rule is about proofs, not luck
    val bad = orders.crossJoin(broadcast(nation))
    assert(rules(bad) === Set(PlanLint.NestedLoopJoin))
    // a global aggregate is exactly one row: corpus stats riding into a
    // scorer — the pattern ~30 queries use — passes on its own shape
    val stats = nation.agg(count(lit(1)).as("n"))
    assert(rules(orders.crossJoin(broadcast(stats))).isEmpty)
    // a limit is ≤ k rows
    assert(rules(orders.crossJoin(broadcast(nation.limit(25)))).isEmpty)
  }

  test("unpartitioned-window fires on a fact-table window, not on a bounded input") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("o_orderkey")
    // a non-rank global window (running sum over the fact table): the
    // linter's target, and a shape DistributeGlobalRank does not touch
    assert(rules(orders.withColumn("cum", sum("o_totalprice").over(w)))
      === Set(PlanLint.UnpartitionedWindow))
    // the RANK variant of the same mistake no longer even reaches the
    // linter — DistributeGlobalRank rewrites it during analysis, so the
    // lint comes back clean on the FIXED plan (and dirty again with the
    // rule disabled: the two layers certify each other)
    assert(rules(orders.withColumn("rn", row_number().over(w))).isEmpty)
    val key = DistributeGlobalRank.ConfKey
    spark.conf.set(key, "false")
    try assert(rules(orders.withColumn("rn", row_number().over(w)))
      === Set(PlanLint.UnpartitionedWindow))
    finally spark.conf.unset(key)
    // ranking the rows of a top-k is single-task by nature AND bounded
    val top = orders.orderBy(col("o_totalprice").desc).limit(10)
    assert(rules(top.withColumn("rn",
      row_number().over(Window.orderBy("o_totalprice")))).isEmpty)
  }

  test("unpushed-scan-filter fires on a servable predicate the scan never received") {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, GreaterThan, Literal}
    import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec}
    // a bare scan carries no pushed filters — v1 sources only receive
    // what Catalyst hands them, so a scan-adjacent Filter holding a
    // servable predicate over THIS scan is exactly the rule's target
    // (the shape a custom/v2 source produces when it declines pushdown)
    val scan = PlanLint.initialPlan(orders).collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.metadata("PushedFilters") === "[]")
    val key = scan.output.find(_.name == "o_orderkey").get
    val bad = FilterExec(EqualTo(key, Literal(1L)), scan)
    assert(PlanLint.lintPlan(bad).map(_.rule) === Seq(PlanLint.UnpushedScanFilter))
    // ...but a predicate the source could never serve (complex-typed
    // column) is not the scan's fault — quiet
    val arrCol = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "arr", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType))()
    assert(PlanLint.lintPlan(
      FilterExec(GreaterThan(arrCol, Literal(null, arrCol.dataType)), scan))
      .isEmpty)
    // through the planner the same comparison pushes down — quiet
    assert(!rules(orders.filter(col("o_orderkey") === 1L))
      .contains(PlanLint.UnpushedScanFilter))
  }

  // ---- layer 2: the bounded-cardinality prover ----

  private def bound(df: DataFrame): Option[Long] =
    PlanLint.boundedRows(PlanLint.initialPlan(df))

  test("boundedRows proves global aggregates, limits, and compositions") {
    assert(bound(orders.agg(sum("o_totalprice"))) === Some(1L))
    assert(bound(orders.limit(40)) === Some(40L))
    assert(bound(orders.orderBy("o_orderkey").limit(7)) === Some(7L))
    // unions add, joins multiply, unary ops pass bounds through
    val one = orders.agg(max("o_totalprice").as("m"))
    assert(bound(one.union(one).filter(col("m") > 0)) === Some(2L))
    assert(bound(one.crossJoin(orders.limit(5)).select("m")) === Some(5L))
    // a literal local relation knows its exact size
    assert(bound(Seq(1, 2, 3).toDF("x")) === Some(3L))
  }

  test("boundedRows refuses scans, keyed aggregates, and explodes") {
    assert(bound(orders) === None)
    assert(bound(orders.groupBy("o_orderstatus").count()) === None)
    // explode can EXPAND a bounded input arbitrarily — the proof stops
    val arr = orders.limit(3)
      .select(split(lit("a b c d"), " ").as("w"))
    assert(bound(arr.select(explode(col("w")))) === None)
    // and the generous constant cap refuses a "bounded" million rows
    assert(bound(orders.limit(1000000)) === None)
  }

  // ---- layer 3: the suite-wide sweep ----

  /** Findings the linter cannot clear statically, each with the
    * boundedness argument that clears it semantically. Key → rule →
    * reason. An entry that stops firing fails the staleness assertion
    * below, so immunity expires with the fix.
    */
  private val allow: Map[String, Map[String, String]] = Map(
    "embedding_neardup" -> Map(PlanLint.NestedLoopJoin ->
      ("the labeled EXACT all-pairs baseline (survey mandate); the scale " +
        "path is embedding_neardup_lsh, which lints clean")),
    "lateness_audit" -> Map(PlanLint.UnpartitionedWindow ->
      ("hierarchical high-water-mark: the global window reads the per-day " +
        "maxima — one row per day in the audited range, not per event")),
    "rolling_active_sketch" -> Map(PlanLint.NestedLoopJoin ->
      ("trailing-week range join over the per-day sketch table — one row " +
        "per day; the unbounded side is the 7-day report spine")),
    // (seasonality_profile's 168-row window entry expired in r10: its
    // whole-partition aggregate now auto-rewrites to a broadcast via
    // DistributeGlobalRank, so the unpartitioned window is gone)
    "segment_overlap" -> Map(PlanLint.NestedLoopJoin ->
      ("segment-pair inequality join over the per-event-type sketch " +
        "table — |event types| rows, a domain constant")),
    "similarity_scores" -> Map(PlanLint.NestedLoopJoin ->
      ("reference-parity scorer: the candidate dict is ≤ 8 rows by the " +
        "ported contract (orders_etl.py fixture)"))
  )

  test("every SparkEntry query lints clean of 100 TB anti-patterns") {
    val fired = scala.collection.mutable.Set[(String, String)]()
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, q) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val findings = PlanLint.lint(q(spark, sfDir))
      val allowed = allow.getOrElse(name, Map.empty)
      findings.foreach { f =>
        if (allowed.contains(f.rule)) fired += ((name, f.rule))
        else bad += s"$name: $f"
      }
    }
    assert(bad.isEmpty,
      s"un-allowlisted scale anti-patterns:\n${bad.mkString("\n")}")
    val stale = for {
      (name, byRule) <- allow.toSeq
      rule <- byRule.keys if !fired.contains((name, rule))
    } yield s"$name/$rule"
    assert(stale.isEmpty,
      s"allowlist entries that no longer fire — remove them: " +
        s"${stale.sorted.mkString(", ")}")
  }
}

package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-plan shapes the scaladocs promise, so a refactor
  * that silently degrades a plan (full sort where a top-k heap ran, a
  * windowed rank where WindowGroupLimit pruned) fails a spec instead of
  * only showing up as a bench regression. Executed plans, sf0.001.
  */
class PlanShapeSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan.toString
  }

  /** The INITIAL physical plan, unwrapped from AQE. The properties
    * asserted on it (probe placement, shuffle count) are decided by the
    * optimizer before execution; AQE re-optimization can coalesce or
    * specialize exchanges but does not move deterministic filters or add
    * shuffles, so the static plan is the right artifact to pin — and it
    * costs no execution.
    */
  private def physicalPlan(name: String)
  : org.apache.spark.sql.execution.SparkPlan =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("join_bloom_prune: the bloom probe filters the fact BEFORE its shuffle") {
    // the operator's whole reason to exist — if the probe migrates above
    // the exchange, the full fact table crosses the wire again
    val finalPlan = physicalPlan("join_bloom_prune")
    val probeFilters = finalPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.exists(
          _.isInstanceOf[graft.functions.BloomMightContain]) => f
    }
    assert(probeFilters.nonEmpty, s"bloom probe missing:\n$finalPlan")
    probeFilters.foreach { f =>
      val shufflesBelow = f.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
      }
      assert(shufflesBelow.isEmpty,
        s"bloom probe sits above a shuffle — pruning after the wire:\n$finalPlan")
    }
  }

  test("banded/fused joins never degrade to nested loops or cartesians") {
    // the LSH-style band join (image_phash_dedup) and the RRF fusion
    // (hybrid_search_rrf) are equi-joins by construction — a refactor
    // that breaks the equi-key would silently plan a nested loop and
    // turn work-∝-collisions into all-pairs
    for (key <- Seq("image_phash_dedup", "hybrid_search_rrf")) {
      val plan = executedPlan(key)
      assert(!plan.contains("CartesianProduct"),
        s"$key plans a cartesian:\n$plan")
    }
    // the band join itself has no scalar crossJoins, so there a nested
    // loop of ANY kind means the equi-key was lost (hybrid_search_rrf
    // legitimately BNLJs its 1-row corpus-stats broadcasts)
    val banded = executedPlan("image_phash_dedup")
    assert(!banded.contains("BroadcastNestedLoopJoin"),
      s"band join lost its equi-key:\n$banded")
  }

  test("feature_hashing shuffles only for its final total order") {
    // the featurization itself is a narrow map — the ONLY exchange
    // allowed is the range partitioning of the deterministic ORDER BY
    val finalPlan = physicalPlan("feature_hashing")
    val shuffles = finalPlan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
    }
    assert(shuffles.size <= 1,
      s"feature_hashing gained a non-sort shuffle:\n$finalPlan")
  }

  test("path_topk's k-cut is a TakeOrdered, never a full global sort") {
    assert(executedPlan("path_topk").contains("TakeOrderedAndProject"))
  }

  test("sample_per_group prunes per-stratum rows with WindowGroupLimit") {
    assert(executedPlan("sample_per_group").contains("WindowGroupLimit"))
  }

  test("sample_weighted's weighted top-k is a TakeOrdered over the scan") {
    assert(executedPlan("sample_weighted").contains("TakeOrderedAndProject"))
  }

  test("bucketed_join: no exchange anywhere below the bucket-aligned SMJ") {
    // the whole point of the bucket layout: the orders⋈lineitem join and
    // the per-order agg ride the load-time bucket shuffle. In the printed
    // tree everything after the SortMergeJoin line IS its subtree (the
    // rollup/sort above it print first), so the join subtree must be
    // exchange-free; only the tiny 5-row priority rollup may exchange.
    val plan = executedPlan("bucketed_join")
    assert(plan.contains("SortMergeJoin"), s"bucket join lost its SMJ:\n$plan")
    val below = plan.split("SortMergeJoin", 2)(1)
    assert(!below.contains("Exchange"),
      s"exchange below the bucket-aligned join:\n$plan")
  }

  test("q3: TakeOrdered top-10; q5: dimensions broadcast, never shuffled") {
    val q3 = executedPlan("q3_shipping_priority")
    assert(q3.contains("TakeOrderedAndProject"), s"q3 lost its top-k:\n$q3")
    val q5 = executedPlan("q5_local_supplier")
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(q5).length
    assert(nBroadcast >= 2, s"q5 dimension joins not broadcast:\n$q5")
  }

  test("aggregation queries hash-aggregate (no SortAggregate fallback)") {
    for (q <- Seq("agg_pricing_summary", "drift_kl", "growth_accounting")) {
      val plan = executedPlan(q)
      assert(!plan.contains("SortAggregate"), s"$q fell back to SortAggregate")
      assert(plan.contains("HashAggregate"), s"$q lost its hash aggregate")
    }
  }

  test("lateness_audit: the event-level window is partitioned (by day)") {
    // the running HWM is hierarchical — the only unpartitioned window
    // allowed is the one-row-per-day cross-day running max (its child
    // aggregates to day grain first); the events-grain window must carry
    // a partition spec or the whole table collapses into one sort task
    val plan = physicalPlan("lateness_audit")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, s"lateness_audit lost its windows:\n$plan")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val aggsBelow = w.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }
      assert(aggsBelow.nonEmpty,
        s"unpartitioned window runs at event grain (no day rollup below):\n$plan")
    }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      s"event-level window lost its day partitioning:\n$plan")
  }

  test("q19: the disjunctive join stays ONE equi-join with pushed OR filters") {
    // Q19's whole planner point: the OR-of-ANDs repeats the
    // p_partkey = l_partkey equi-condition, and Catalyst must factor it
    // out — ONE hash join with the disjunction as residual. Degradations
    // to pin against: a cartesian/BNLJ with a disjunctive filter
    // (all-pairs at scale), or three scan-join passes (reads the fact
    // table three times)
    val plan = physicalPlan("q19_discounted_revenue")
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.length == 1,
      s"q19 must plan exactly one join, got ${joins.length}:\n$plan")
    assert(!joins.head.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec] &&
      !joins.head.isInstanceOf[
        org.apache.spark.sql.execution.joins.CartesianProductExec],
      s"q19 degraded to a nested loop:\n$plan")
    // and the per-side disjunctions were derived onto BOTH scans, so each
    // input shrinks before the join
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.exists(s => s.dataFilters.exists(_.toString.contains("OR")) &&
      s.dataFilters.mkString.contains("l_quantity")),
      s"lineitem scan lost its derived quantity disjunction:\n$plan")
    assert(scans.exists(s => s.dataFilters.exists(_.toString.contains("OR")) &&
      s.dataFilters.mkString.contains("p_brand")),
      s"part scan lost its derived brand/size disjunction:\n$plan")
  }

  test("q13: outer join keeps zero-order customers; join-side filter pushes") {
    // the Q13 trap is a WHERE filter that silently turns the LEFT JOIN
    // inner — pin that the executed join is still LeftOuter AND the
    // result actually carries the zero-order bucket (c_count = 0)
    val plan = executedPlan("q13_customer_distribution")
    assert(plan.contains("LeftOuter"),
      s"q13 lost its outer join (zero-order customers dropped):\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val rows = graft.SparkEntry.queries("q13_customer_distribution")(spark, sfDir)
      .collect()
    assert(rows.map(_.getLong(0)).contains(0L),
      "no c_count = 0 bucket: the outer join's null-extension was lost")
  }

  test("histogram_quantile: no unpartitioned window over the fact table") {
    // r9 weak flag: equi-depth binning via ntile(4) OVER (ORDER BY ...)
    // funneled the whole orders table through one sort task. The
    // distributed form (ops/Ranking) allows an unpartitioned window ONLY
    // over aggregated metadata (the one-row-per-range offsets frame — its
    // child aggregates first); the fact-grain window must be partitioned
    // (by the range id), and the per-range row_number must actually be
    // there
    val plan = physicalPlan("histogram_quantile")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, s"histogram_quantile lost its windows:\n$plan")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val aggsBelow = w.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }
      assert(aggsBelow.nonEmpty,
        s"unpartitioned window over raw fact rows (no rollup below):\n$plan")
    }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      s"per-range row_number lost its range-id partitioning:\n$plan")
  }

  test("correlated subqueries plan as existence equi-joins, never BNLJ") {
    // the whole point of the SqlSurface keys: Catalyst's
    // RewritePredicateSubquery / RewriteCorrelatedScalarSubquery must turn
    // EXISTS / NOT EXISTS / correlated scalar avg into hash-equi
    // semi/anti/outer joins on the correlation key — a
    // BroadcastNestedLoopJoin or CartesianProduct anywhere means the
    // correlation was lost and the plan is all-pairs at scale
    for (q <- Seq("q4_order_priority", "q17_small_qty", "q21_wait_suppliers",
      "q2_min_supply", "q11_important_parts", "q15_top_supplier",
      "q20_volume_suppliers", "q22_dormant_customers")) {
      val plan = executedPlan(q)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q subquery degraded to a nested loop:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian:\n$plan")
    }
    val q4 = executedPlan("q4_order_priority")
    assert(q4.contains("LeftSemi"), s"q4 EXISTS is not a semi join:\n$q4")
    val q21 = executedPlan("q21_wait_suppliers")
    assert(q21.contains("LeftSemi"), s"q21 EXISTS is not a semi join:\n$q21")
    assert(q21.contains("LeftAnti"), s"q21 NOT EXISTS is not an anti join:\n$q21")
    // Q20's nested IN must stack TWO semi joins (supplier←agg, agg←part);
    // a single semi means Catalyst collapsed the part filter into a scan
    // of something non-equi (or worse, a BNLJ already caught above)
    val q20 = executedPlan("q20_volume_suppliers")
    assert("LeftSemi".r.findAllIn(q20).size >= 2,
      s"q20 nested IN is not two stacked semi joins:\n$q20")
    // Q22's NOT EXISTS over the date-restricted orders slice is an anti
    // join, and its uncorrelated avg threshold arrives as a ScalarSubquery
    // feed, not a join
    val q22 = executedPlan("q22_dormant_customers")
    assert(q22.contains("LeftAnti"), s"q22 NOT EXISTS is not an anti join:\n$q22")
    // Q2's correlated scalar MIN decorrelates into a per-part aggregate
    // joined back on the correlation key — the plan must carry a min(...)
    // aggregate, not a per-row re-scan
    val q2 = executedPlan("q2_min_supply")
    assert(q2.contains("min("), s"q2 correlated MIN did not decorrelate:\n$q2")
  }

  test("recursive CTE and LATERAL LIMIT plan as loop-join / pruned window") {
    for (q <- Seq("recursive_tree_depth", "lateral_topk_orders")) {
      val plan = executedPlan(q)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q degraded to a nested loop:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian:\n$plan")
    }
    // recursion executes as UnionLoop with a hash-equi frontier join per
    // step — linear total work, not per-row re-evaluation
    val rec = executedPlan("recursive_tree_depth")
    assert(rec.contains("UnionLoop"), s"recursion lost its loop plan:\n$rec")
    // the LATERAL LIMIT must decorrelate into a WindowGroupLimit-pruned
    // row_number (map-side top-k), the same machinery as topk_per_group —
    // per-customer subquery re-execution would be quadratic at scale
    val lat = executedPlan("lateral_topk_orders")
    assert(lat.contains("WindowGroupLimit"),
      s"lateral top-k lost its group-limit pruning:\n$lat")
  }

  test("q6/q14: scan-decided aggregates — predicates at the scan, no stray joins") {
    // Q6 is the pure scan query: its entire cost is decided by parquet
    // pruning, so every predicate must appear in PushedFilters and the
    // plan must contain no join at all
    val q6Plan = physicalPlan("q6_forecast_revenue")
    // the rendered plan truncates long PushedFilters lists — read the
    // full list off the scan node's metadata instead
    val q6Scans = q6Plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(q6Scans.size == 1, s"q6 expected one scan:\n$q6Plan")
    val q6Pushed = q6Scans.head.metadata("PushedFilters")
    for (pushed <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
        "LessThan(l_quantity"))
      assert(q6Pushed.contains(pushed),
        s"q6 predicate not pushed ($pushed): $q6Pushed")
    val q6 = q6Plan.toString
    assert(!q6.contains("Join"), s"q6 grew a join:\n$q6")
    // Q14's conditional-sum ratio is ONE aggregate over ONE broadcast
    // join — a second join or a shuffle of the month slice means the
    // CASE split was planned as two passes
    val q14 = executedPlan("q14_promo_effect")
    assert("BroadcastHashJoin".r.findAllIn(q14).size == 1,
      s"q14 is not exactly one broadcast join:\n$q14")
    assert(q14.contains("GreaterThanOrEqual(l_shipdate,1996-03-01"),
      s"q14 month filter not pushed:\n$q14")
    assert(!q14.contains("SortMergeJoin") && !q14.contains("CartesianProduct"),
      s"q14 shuffled or crossed:\n$q14")
  }

  test("global_rank_auto: the naive rank SQL runs distributed in the driver path") {
    // the DistributeGlobalRank demonstration key: its SQL text is the
    // naive global row_number + ntile over the fact table, and the
    // executed plan must carry NO unpartitioned rank window — the
    // optimizer rule rewrote both functions onto one distributed rank
    val plan = physicalPlan("global_rank_auto")
    val badWindows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty && w.windowExpression.exists(_.exists {
          case _: org.apache.spark.sql.catalyst.expressions.RowNumber => true
          case _: org.apache.spark.sql.catalyst.expressions.NTile => true
          case _ => false
        }) => w
    }
    assert(badWindows.isEmpty,
      s"naive rank window survived into the driver plan:\n$plan")
    assert(plan.toString.contains("__graft"),
      s"rewrite did not fire for global_rank_auto:\n$plan")
  }

  test("global_rank_dense: the dense_rank leg runs distributed in the driver path") {
    // tie-heavy topology (50 distinct l_quantity values over the whole
    // fact): the rewrite must rank the distinct-key frame in a second
    // distributed pass — no unpartitioned rank/dense_rank window may
    // survive into the executed plan
    val plan = physicalPlan("global_rank_dense")
    val badWindows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty && w.windowExpression.exists(_.exists {
          case _: org.apache.spark.sql.catalyst.expressions.DenseRank => true
          case _: org.apache.spark.sql.catalyst.expressions.Rank => true
          case _ => false
        }) => w
    }
    assert(badWindows.isEmpty,
      s"naive dense_rank window survived into the driver plan:\n$plan")
    assert(plan.toString.contains("__graft"),
      s"rewrite did not fire for global_rank_dense:\n$plan")
  }

  test("global_running_auto/rows: naive running aggregates run distributed") {
    // the running-aggregate legs of DistributeGlobalRank: naive
    // cumulative sum/count/max SQL straight over the fact tables; the
    // rewrite must fire (marker) and the executed plan must carry no
    // unpartitioned window over an unbounded input (PlanLint's bounded
    // prover accepts the machinery's metadata-sized offsets windows)
    for (q <- Seq("global_running_auto", "global_running_rows",
        "global_offset_auto")) {
      val plan = physicalPlan(q)
      assert(plan.toString.contains("__graft"),
        s"rewrite did not fire for $q:\n$plan")
      val findings = graft.plans.PlanLint.lintPlan(plan)
        .filter(_.rule == graft.plans.PlanLint.UnpartitionedWindow)
      assert(findings.isEmpty, s"$q kept a single-task window: $findings")
    }
  }

  test("q8/q9/q10/q12: dimension-broadcast join trees, no nested loops") {
    for (q <- Seq("q8_market_share", "q9_product_profit",
        "q10_returned_items", "q12_priority_lines")) {
      val plan = executedPlan(q)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"$q degraded to a nested loop/cartesian:\n$plan")
    }
    // Q8: the selective dimension predicates prune at the scans, before
    // any broadcast — PROMO on part, the two-year window on orders
    val q8 = executedPlan("q8_market_share")
    assert(q8.contains("EqualTo(p_type,PROMO)"),
      s"q8 PROMO filter not pushed into the part scan:\n$q8")
    assert(q8.contains("GreaterThanOrEqual(o_orderdate,1996-01-01"),
      s"q8 date window not pushed into the orders scan:\n$q8")
    // Q9: the LIKE prunes the part side before its broadcast (Parquet
    // pushes the contains as a StringContains filter)
    val q9 = executedPlan("q9_product_profit")
    assert(q9.contains("StringContains(p_name,red)"),
      s"q9 LIKE not pushed into the part scan:\n$q9")
    // Q10: the 20-row cut is a TakeOrdered heap over the rounded
    // revenue — never a global sort of the aggregate
    val q10 = executedPlan("q10_returned_items")
    assert(q10.contains("TakeOrderedAndProject"),
      s"q10 lost its top-k heap:\n$q10")
    assert(q10.contains("EqualTo(l_returnflag,R)"),
      s"q10 return-flag filter not pushed into the lineitem scan:\n$q10")
  }
}

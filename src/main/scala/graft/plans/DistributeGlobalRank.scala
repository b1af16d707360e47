package graft.plans

import graft.ops.Ranking
import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{coalesce, lit, nanvl}
import org.apache.spark.sql.types._

/** Optimizer-level auto-distribution of global ranks: an unpartitioned
  * `row_number()`/`ntile(k)` window over an UNBOUNDED input — the single
  * most common accidental scale-killer in analyst SQL (Spark itself only
  * warns: "No Partition Defined … can cause serious performance
  * degradation") — is rewritten during optimization into the distributed
  * [[graft.ops.Ranking]] form: GK-sketch range split, per-range parallel
  * windows, broadcast prefix offsets. Bit-identical output (RankingSpec
  * pins parity across ragged sizes, ties, and descending/proxy orders),
  * no single-task sort at any data size. Registered by
  * [[GraftExtensions]]; disable with `spark.graft.distributeGlobalRank=
  * false`.
  *
  * The rule runs LATE IN THE OPTIMIZER, not the analyzer, and the timing
  * is load-bearing: DataFrame pipelines analyze incrementally, so at
  * analysis time a `.withColumn(rank).filter(rank <= k)` chain presents
  * the window WITHOUT its filter and an analysis-time rewrite would
  * destroy the top-k idiom before it even forms (measured 3× on the RRF
  * fusion query before the move). By the optimizer's user-provided
  * batch, the full tree is present and `InferWindowGroupLimit` /
  * `LimitPushDownThroughWindow` have already claimed the top-k shapes.
  *
  * The rule REFUSES anything it cannot prove it preserves — each guard is
  * a correctness or performance story, not a limitation note:
  *
  *   - a window whose child is already a `WindowGroupLimit`, and a rank
  *     consumed by any remaining `Filter` in the tree, stay untouched:
  *     the top-k heap is strictly better than a full distributed rank
  *     (checked conservatively against every filter);
  *   - a child with a known `maxRows` bound (a limit — including the one
  *     `LimitPushDownThroughWindow` inserts — or a global aggregate)
  *     stays untouched: a bounded single-task sort is cheaper than the
  *     5-stage distributed pipeline;
  *   - the WHOLE SQL rank family rewrites: `row_number`/`ntile`
  *     arithmetically from (rank, n); `rank`/`percent_rank`/`cume_dist`
  *     read their peer group's boundary row numbers through a window
  *     partitioned by the order keys (a keyed shuffle, distributes
  *     fine); `dense_rank` ranks the DISTINCT key frame — a second,
  *     much smaller distributed rank — and joins it back null-safely;
  *   - the leading sort key must admit a numeric range proxy (numeric /
  *     timestamp cast, string via [[Ranking.stringPrefixFraction]]);
  *     direction, null placement, and NaN placement are all encoded into
  *     the proxy (split points only steer balance, so a lossy proxy can
  *     degrade parallelism but never a rank);
  *   - a multi-function window node stays untouched (the other window
  *     functions would still need the single-task sort anyway).
  *
  * The replacement subtree is built with the SAME DataFrame-level
  * machinery users call directly ([[Ranking.withGlobalRowNumber]] /
  * [[Ranking.withNtile]]), run through its own full optimization (the
  * outer optimizer's main batches are already past, so the splice brings
  * its pushdown/pruning with it), then spliced with the original output
  * attribute ids. The spliced subtree cannot re-trigger the rule: its
  * per-range window is partitioned, its offsets windows sit above a
  * structural `limit` (bounded `maxRows`), so the fixed point is reached
  * in one application.
  */
object DistributeGlobalRank extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.distributeGlobalRank"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    if (!plan.resolved) return plan
    // every attribute any Filter consumes, anywhere in the tree: a rank
    // among them is (or may be) a top-k idiom the main batches have not
    // finished claiming — skip. Conservative by design: over-guarding
    // skips an optimization, under-guarding would destroy one.
    val filterRefs = AttributeSet(
      plan.collect { case Filter(cond, _) => cond.references.toSeq }.flatten)
    plan.transformUp {
      case w: Window
        if w.windowExpressions.forall(a => !filterRefs.contains(a.toAttribute)) =>
        rewrite(w).getOrElse(w)
    }
  }

  private def rewrite(w: Window): Option[LogicalPlan] = {
    if (w.partitionSpec.nonEmpty || w.orderSpec.isEmpty) return None
    if (!w.child.resolved || w.child.maxRows.isDefined) return None
    if (w.child.isInstanceOf[WindowGroupLimit]) return None
    if (w.windowExpressions.isEmpty) return None
    // every function in the node must derive from the global 0-based row
    // number — they then all share ONE distributed rank pass. row_number
    // and ntile(k) are pure arithmetic on (rank, n); the tie-aware trio
    // (rank / percent_rank / cume_dist) additionally reads its peer
    // group's first/last row number through a window PARTITIONED by the
    // order keys (a keyed shuffle — distributes like any groupBy; SQL
    // peers and PARTITION BY agree that nulls group together);
    // dense_rank adds a second distributed rank over the DISTINCT key
    // frame, joined back null-safely.
    sealed trait RankFn
    case object RowNum extends RankFn
    case class Tile(k: Int) extends RankFn
    case object TieRank extends RankFn
    case object TiePercent extends RankFn
    case object TieCume extends RankFn
    case object TieDense extends RankFn
    val funcs: Seq[(String, ExprId, RankFn)] = w.windowExpressions.map {
      case a @ Alias(WindowExpression(f, spec), n)
          if spec.partitionSpec.isEmpty && spec.orderSpec == w.orderSpec =>
        f match {
          case RowNumber() => (n, a.exprId, RowNum)
          case NTile(Literal(k: Int, IntegerType)) => (n, a.exprId, Tile(k))
          case _: Rank => (n, a.exprId, TieRank)
          case _: PercentRank => (n, a.exprId, TiePercent)
          case _: CumeDist => (n, a.exprId, TieCume)
          case _: DenseRank => (n, a.exprId, TieDense)
          case _ => return None
        }
      case _ => return None
    }
    val proxy = proxyFor(w.orderSpec.head).getOrElse(return None)
    val spark = SparkSession.active
    val childDf = GraftColumnBridge.ofRows(spark, w.child)
    val orderCols = w.orderSpec.map(sortCol)
    val tmpRank = "__graft_auto_rank"
    val tmpN = "__graft_auto_n"
    val needN = funcs.exists(f =>
      f._3 != RowNum && f._3 != TieRank)
    var ranked = Ranking.withGlobalRankAndCount(childDf, orderCols, tmpRank,
      if (needN) Some(tmpN) else None, Some(proxy))
    import org.apache.spark.sql.functions.{col => fcol, max => fmax, min => fmin, when => fwhen}
    val needTie = funcs.exists(f =>
      f._3 == TieRank || f._3 == TiePercent || f._3 == TieCume)
    val tieW = if (needTie) {
      val keys = w.orderSpec.map(so => GraftColumnBridge.column(so.child))
      Some(org.apache.spark.sql.expressions.Window.partitionBy(keys: _*))
    } else None
    // dense_rank = this row's key-tuple's position among the DISTINCT
    // key tuples — a second (much smaller) distributed rank over the
    // distinct frame, joined back null-safely (<=> matches SQL peer
    // semantics: nulls tie with nulls, and Spark normalizes NaN)
    val tmpDense = "__graft_auto_dense"
    if (funcs.exists(_._3 == TieDense)) {
      val keyNames = w.orderSpec.indices.map(i => s"__graft_auto_key_$i")
      ranked = keyNames.zip(w.orderSpec).foldLeft(ranked) {
        case (df, (nm, so)) =>
          df.withColumn(nm, GraftColumnBridge.column(so.child))
      }
      val dKeyNames = keyNames.map(_ + "_d")
      val distinct = ranked
        .select(keyNames.zip(dKeyNames)
          .map { case (k, d) => fcol(k).as(d) }: _*)
        .distinct()
      val dOrder = dKeyNames.zip(w.orderSpec).map { case (nm, so) =>
        directed(fcol(nm), so.direction, so.nullOrdering)
      }
      val head = w.orderSpec.head
      val dProxy = proxyOf(fcol(dKeyNames.head), head.child.dataType,
        head.direction, head.nullOrdering).getOrElse(return None)
      val dRanked = Ranking
        .withGlobalRowNumber(distinct, dOrder, tmpDense, dProxy)
      val cond = keyNames.zip(dKeyNames)
        .map { case (k, d) => ranked(k) <=> dRanked(d) }.reduce(_ && _)
      ranked = ranked.join(dRanked, cond)
        .drop((keyNames ++ dKeyNames): _*)
    }
    val rn = fcol(tmpRank)
    val n = fcol(tmpN)
    val outNames = funcs.indices.map(i => s"__graft_auto_out_$i")
    funcs.zip(outNames).foreach { case ((_, _, fn), nm) =>
      val c = fn match {
        case Tile(k) => Ranking.ntileFromRank(rn, n, k).cast("int")
        case RowNum => (rn + lit(1L)).cast("int")
        // SQL rank = first peer's row number; cume_dist = last peer's
        // row number / n; percent_rank = (rank-1)/(n-1), 0 when n = 1
        case TieRank => (fmin(rn).over(tieW.get) + lit(1L)).cast("int")
        case TiePercent =>
          fwhen(n === lit(1L), lit(0.0)).otherwise(
            fmin(rn).over(tieW.get).cast("double") /
              (n - lit(1L)).cast("double"))
        case TieCume =>
          (fmax(rn).over(tieW.get) + lit(1L)).cast("double") /
            n.cast("double")
        case TieDense => (fcol(tmpDense) + lit(1L)).cast("int")
      }
      ranked = ranked.withColumn(nm, c)
    }
    ranked = ranked.drop(
      (tmpRank +: (if (needN) Seq(tmpN) else Nil)) ++
        (if (funcs.exists(_._3 == TieDense)) Seq(tmpDense) else Nil): _*)
    // fully optimize the replacement in its own QueryExecution: the
    // outer optimizer's pushdown/pruning batches are already past, so
    // the splice must arrive pre-optimized (output ids are stable across
    // optimization — only the tree under them changes)
    val analyzed = ranked.queryExecution.optimizedPlan
    val byName = analyzed.output.map(a => a.name -> a).toMap
    val outAttrs = outNames.map(n => byName.getOrElse(n, return None))
    val childAttrs = analyzed.output.filterNot(a => outNames.contains(a.name))
    if (childAttrs.size != w.child.output.size) return None
    // original ids survive Ranking's projections except where the
    // analyzer's self-join deduplication re-aliased — restore them so
    // everything upstream of the old Window still resolves
    val restored = w.child.output.zip(childAttrs).map { case (orig, got) =>
      if (orig.exprId == got.exprId) got
      else Alias(got, orig.name)(exprId = orig.exprId)
    }
    val ranks = funcs.zip(outAttrs).map { case ((name, id, _), attr) =>
      Alias(attr, name)(exprId = id)
    }
    logInfo(s"distributing ${funcs.size} unpartitioned rank function(s) " +
      s"over ${w.orderSpec.map(_.sql).mkString(", ")}")
    Some(Project(restored ++ ranks, analyzed))
  }

  /** The numeric range-split proxy for the leading sort key: monotone
    * non-decreasing along the sort order, with null and NaN placement
    * folded in as ±MaxValue fills (nulls-first means smallest-proxy;
    * NaN sorts greatest in Spark, so last ascending / first descending).
    */
  private def proxyFor(so: SortOrder): Option[Column] =
    proxyOf(GraftColumnBridge.column(so.child), so.child.dataType,
      so.direction, so.nullOrdering)

  private def proxyOf(c: Column, dt: DataType, direction: SortDirection,
                      nulls: NullOrdering): Option[Column] = {
    val base: Column = dt match {
      case _: NumericType | TimestampType | TimestampNTZType =>
        c.cast("double")
      case StringType => Ranking.stringPrefixFraction(c)
      case _ => return None
    }
    val signed = if (direction == Descending) -base else base
    val nanFill =
      if (direction == Descending) Double.MinValue else Double.MaxValue
    val nullFill =
      if (nulls == NullsFirst) Double.MinValue else Double.MaxValue
    Some(coalesce(nanvl(signed, lit(nanFill)), lit(nullFill)))
  }

  private def directed(c: Column, direction: SortDirection,
                       nulls: NullOrdering): Column =
    (direction, nulls) match {
      case (Ascending, NullsFirst) => c.asc_nulls_first
      case (Ascending, NullsLast) => c.asc_nulls_last
      case (Descending, NullsFirst) => c.desc_nulls_first
      case (Descending, NullsLast) => c.desc_nulls_last
    }

  private def sortCol(so: SortOrder): Column = {
    val c = GraftColumnBridge.column(so.child)
    (so.direction, so.nullOrdering) match {
      case (Ascending, NullsFirst) => c.asc_nulls_first
      case (Ascending, NullsLast) => c.asc_nulls_last
      case (Descending, NullsFirst) => c.desc_nulls_first
      case (Descending, NullsLast) => c.desc_nulls_last
    }
  }
}

package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BinaryComparison, Literal}
import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.execution.{CollectLimitExec, ColumnarToRowExec, FileSourceScanExec, FilterExec, GlobalLimitExec, InputAdapter, LocalLimitExec, LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec, UnionExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Physical-plan linter: the 100 TB anti-pattern checklist as a library
  * call instead of a reviewer's grep.
  *
  * Every plan pin this repo carries (PlanShapeSpec, StorageLayoutSpec)
  * guards ONE query against ONE regression. `PlanLint` is the general
  * form: walk any query's physical plan and report every occurrence of
  * the plan shapes that stop scaling when the data grows 100× —
  *
  *   - `cartesian-product` — `CartesianProductExec`: all-pairs work.
  *   - `nested-loop-join` — `BroadcastNestedLoopJoinExec`: per-row scan
  *     of the broadcast side; an equi-join that lost its key. The linter
  *     PROVES the legitimate exception instead of asking for it: a build
  *     side whose plan statically bounds to a constant row count (a
  *     global aggregate is exactly 1 row, a limit-k is ≤ k — see
  *     [[boundedRows]]) is per-row work O(constant), i.e. a projection
  *     in disguise, and is not flagged. Corpus stats riding into a
  *     scorer pass the lint on their own shape.
  *   - `unpartitioned-window` — a `Window`/`WindowGroupLimit` whose
  *     partitionSpec is empty: Spark moves EVERY row to one task. Same
  *     proof applies — a window whose INPUT is constant-bounded (ranking
  *     the 1-row global aggregate, the ≤100-row top-k) is skipped; an
  *     unbounded input (a fact table, a keyed aggregate whose group
  *     count grows with data) is flagged.
  *   - `unpushed-scan-filter` — a `Filter` sitting directly on a file
  *     scan that pushed NOTHING down, while the filter compares plain
  *     atomic columns to literals (i.e. predicates the source COULD
  *     serve): row groups that statistics would have skipped are read,
  *     decoded, then dropped.
  *   - `duplicate-window-function` — a `Window` over an unbounded input
  *     carrying two or more physically identical (canonically equal)
  *     window functions: Spark extracts one function per OCCURRENCE of
  *     a window expression, with no dedup across e.g. CASE branches, so
  *     every duplicate is a full extra aggregate buffer updated per row
  *     (the r16 `withGlobalPrefix` finding: 12 same-frame sums where 4
  *     sufficed). Always waste; fix by materializing the expression
  *     once and referencing the column.
  *
  * The walk runs on the INITIAL physical plan (pre-AQE, unwrapped from
  * [[AdaptiveSparkPlanExec]]), so linting never executes the query —
  * construction is job-free, and the lint of a 208-query suite costs
  * seconds. AQE's runtime re-planning only narrows these findings
  * (smaller-than-expected sides convert SMJ→broadcast; it never
  * introduces a cartesian, a nested loop, or an unpartitioned window),
  * so a clean initial plan is a clean final plan for every rule here.
  *
  * `PlanLintSpec` runs this over EVERY `SparkEntry.queries` key with a
  * per-query allowlist whose entries each carry a boundedness argument —
  * the suite-wide audit the per-query pins approximate.
  */
object PlanLint {

  /** One lint finding: which rule fired, on which plan node, with a
    * one-line detail for triage.
    */
  final case class Finding(rule: String, node: String, detail: String) {
    override def toString: String = s"[$rule] $node: $detail"
  }

  val CartesianProduct = "cartesian-product"
  val NestedLoopJoin = "nested-loop-join"
  val UnpartitionedWindow = "unpartitioned-window"
  val UnpushedScanFilter = "unpushed-scan-filter"
  val DuplicateWindowFunction = "duplicate-window-function"

  /** Lint a DataFrame's (initial, pre-AQE) physical plan. `allow`
    * suppresses findings by rule name — pass the rules a caller has
    * independently argued are bounded for THIS query.
    */
  def lint(df: DataFrame, allow: Set[String] = Set.empty): Seq[Finding] =
    lintPlan(initialPlan(df)).filterNot(f => allow.contains(f.rule))

  /** Unwrap AQE without executing: before any action,
    * `AdaptiveSparkPlanExec.executedPlan` IS the initial plan.
    */
  def initialPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  def lintPlan(plan: SparkPlan): Seq[Finding] = {
    val out = Seq.newBuilder[Finding]
    plan.foreach {
      case c if c.nodeName == "CartesianProduct" =>
        out += Finding(CartesianProduct, c.nodeName,
          "all-pairs join — work is |left|x|right|")
      case j: BroadcastNestedLoopJoinExec =>
        val build = if (j.buildSide == BuildLeft) j.left else j.right
        if (boundedRows(build).isEmpty)
          out += Finding(NestedLoopJoin, j.nodeName,
            s"${j.joinType} without an equi-key — every probe row walks " +
              "an UNBOUNDED broadcast side")
      case w: WindowExec =>
        if (w.partitionSpec.isEmpty && boundedRows(w.child).isEmpty)
          out += Finding(UnpartitionedWindow, w.nodeName,
            "empty PARTITION BY over an unbounded input — all rows move " +
              "to ONE task")
        // Spark's window extraction creates one PHYSICAL window function
        // per OCCURRENCE of a window expression — identical specs are
        // not deduplicated (e.g. a null-handling CASE referencing the
        // same windowed sum in three branches runs three same-frame
        // aggregates per row; the r16 withGlobalPrefix finding, 12
        // functions where 4 sufficed). Only flag UNBOUNDED inputs: on a
        // constant-bounded frame the duplicate buffers are noise.
        if (boundedRows(w.child).isEmpty) {
          val dups = w.windowExpression
            .collect { case a: org.apache.spark.sql.catalyst.expressions.Alias =>
              a.child }
            .collect { case we: org.apache.spark.sql.catalyst.expressions
              .WindowExpression => we }
            .groupBy(_.canonicalized).filter(_._2.size > 1)
          dups.foreach { case (_, es) =>
            out += Finding(DuplicateWindowFunction, w.nodeName,
              s"${es.size}x physically identical window function " +
                s"(${es.head.windowFunction.prettyName} over one spec) — " +
                "materialize the expression once and reference the column")
          }
        }
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty &&
          boundedRows(w.child).isEmpty =>
        out += Finding(UnpartitionedWindow, w.nodeName,
          "empty PARTITION BY over an unbounded input — all rows move " +
            "to ONE task")
      case f: FilterExec =>
        scanBelow(f.child) match {
          case Some(scan)
            if scan.metadata.get("PushedFilters").contains("[]") &&
              hasSourceServablePredicate(f, scan.output) =>
            out += Finding(UnpushedScanFilter, s"Filter over ${scan.nodeName}",
              "scan pushed no filters while the filter compares plain " +
                "columns to literals — row groups decode only to be dropped")
          case _ =>
        }
      case _ =>
    }
    out.result()
  }

  /** Rows a single nested-loop probe may touch (or a single window task
    * may sort) before the lint calls it a scale problem. Generous on
    * purpose: the rule separates "constant work per row" from "work that
    * grows with the data", not fast constants from slow ones.
    */
  val BoundedRowLimit = 10000L

  /** Statically prove a plan's output row count is bounded by a constant
    * independent of input size. Conservative by construction — `None`
    * means "could not prove", never "unbounded for sure":
    *
    *   - a global aggregate (no grouping keys) is EXACTLY 1 row;
    *   - `GlobalLimit(k)` / `TakeOrderedAndProject(k)` are ≤ k;
    *   - `LocalTableScan` is its literal row count;
    *   - filters/projections/exchanges/sorts preserve or shrink a bound;
    *   - a union is bounded by the sum of bounded children, a join by
    *     the product (an outer join can pad at most to the product too,
    *     since both factors are ≥ 1 when nonempty; an empty side only
    *     shrinks the result further).
    *
    * Keyed aggregates, scans, and generates stay unproven: their
    * cardinality grows with the data, which is exactly what the caller
    * needs to know.
    */
  def boundedRows(plan: SparkPlan): Option[Long] = {
    val bound: Option[Long] = plan match {
      case a: HashAggregateExec if a.groupingExpressions.isEmpty => Some(1L)
      case a: SortAggregateExec if a.groupingExpressions.isEmpty => Some(1L)
      case a: ObjectHashAggregateExec if a.groupingExpressions.isEmpty =>
        Some(1L)
      case l: GlobalLimitExec => Some(l.limit.toLong)
      case l: LocalLimitExec => Some(l.limit.toLong)
      case l: CollectLimitExec => Some(l.limit.toLong)
      case t: TakeOrderedAndProjectExec => Some(t.limit.toLong)
      case t: LocalTableScanExec => Some(t.rows.size.toLong)
      case u: UnionExec =>
        val kids = u.children.map(boundedRows)
        if (kids.forall(_.isDefined)) Some(kids.flatten.sum) else None
      case j: BaseJoinExec =>
        for (l <- boundedRows(j.left); r <- boundedRows(j.right))
          yield math.max(l, 1L) * math.max(r, 1L)
      // row-EXPANDING or arbitrary-multiplicity operators break the
      // "unary nodes preserve or shrink" rule — stop the proof there
      case x if x.nodeName.contains("Generate") ||
        x.nodeName.contains("Expand") || x.nodeName.contains("FlatMap") ||
        x.nodeName.contains("MapPartitions") ||
        x.nodeName.contains("InPandas") => None
      case p if p.children.size == 1 => boundedRows(p.children.head)
      case _ => None
    }
    bound.filter(_ <= BoundedRowLimit)
  }

  /** The file scan a filter sits directly on, seen through the
    * execution-only wrappers codegen inserts (ColumnarToRow, InputAdapter,
    * WholeStageCodegen) — a Project or join in between means the filter is
    * NOT scan-adjacent and the rule correctly stays out of it.
    */
  private def scanBelow(p: SparkPlan): Option[FileSourceScanExec] = p match {
    case s: FileSourceScanExec => Some(s)
    case c: ColumnarToRowExec => scanBelow(c.child)
    case i: InputAdapter => scanBelow(i.child)
    case w: WholeStageCodegenExec => scanBelow(w.child)
    case _ => None
  }

  /** Does the filter contain at least one predicate the file source could
    * have served — a direct atomic-column-vs-literal comparison (the
    * exact shape `DataSourceStrategy.translateFilter` accepts)? Null
    * checks alone don't count: `IsNotNull` pushdown saves little, and
    * flagging it would make the rule fire on every join's implied
    * not-null filters.
    */
  private def hasSourceServablePredicate(
      f: FilterExec, scanOutput: Seq[Attribute]): Boolean = {
    val scanIds = scanOutput.map(_.exprId).toSet
    f.condition.exists {
      case cmp: BinaryComparison => (cmp.left, cmp.right) match {
        case (a: AttributeReference, _: Literal) =>
          scanIds.contains(a.exprId) && isAtomic(a.dataType)
        case (_: Literal, a: AttributeReference) =>
          scanIds.contains(a.exprId) && isAtomic(a.dataType)
        case _ => false
      }
      case _ => false
    }
  }

  /** Sources only serve predicates on scalar columns (AtomicType is
    * `private[sql]`, so test by excluding the complex types).
    */
  private def isAtomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

}

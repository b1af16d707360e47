package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Keep-first deduplication as a first-class logical operator.
  *
  * `DedupKeepFirst(keys, order, child)` declares the *intent* — "one row per
  * key, the first under `order`" — and the analyzer rule
  * [[ResolveDedupKeepFirst]] lowers it to the canonical window+filter form
  * (`row_number() OVER (PARTITION BY keys ORDER BY order) = 1`). Because
  * the lowering happens inside analysis, everything downstream (column
  * pruning through the Window, AQE skew handling on the partition exchange,
  * whole-stage codegen around the filter) applies to the expanded form for
  * free — the textbook reason to lower to existing operators rather than
  * write a physical node (SURVEY §7.5).
  */
case class DedupKeepFirst(keys: Seq[Expression], order: Seq[SortOrder],
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): DedupKeepFirst =
    copy(child = newChild)
}

/** Analyzer rule lowering [[DedupKeepFirst]] to window + filter + project. */
object ResolveDedupKeepFirst extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case DedupKeepFirst(keys, order, child)
        if child.resolved && (keys ++ order).forall(_.resolved) =>
      val rn = Alias(
        WindowExpression(
          RowNumber(),
          WindowSpecDefinition(keys, order,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
        "_graft_rn")()
      val window = Window(Seq(rn), keys, order, child)
      val filtered = Filter(EqualTo(rn.toAttribute, Literal(1)), window)
      Project(child.output, filtered)
  }
}

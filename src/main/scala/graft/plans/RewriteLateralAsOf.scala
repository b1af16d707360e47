package graft.plans

import graft.ops.AsOfJoin
import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, when => fwhen}
import org.apache.spark.sql.types._

/** SQL surface for the as-of join: rewrites the LATERAL-LIMIT-1 idiom —
  * the only way analyst SQL can express `merge_asof` (DuckDB ships a
  * dedicated `ASOF JOIN`; Spark SQL does not) — into the
  * [[AsOfJoin]] union-window plan.
  *
  * The idiom:
  * {{{
  *   SELECT ... FROM clicks c
  *   LEFT JOIN LATERAL (
  *     SELECT ... FROM purchases e
  *     WHERE e.key = c.key AND e.t <= c.t
  *     ORDER BY e.t DESC, e.tie DESC LIMIT 1) p ON true
  * }}}
  *
  * Spark CAN plan this — but its decorrelation materializes the domain
  * of distinct outer timestamps and INNER-JOINS it against the right
  * table on the bare inequality: a BroadcastNestedLoopJoin producing
  * |distinct t| × |rights| pairs before the per-(key, t) top-1 prunes
  * them. Quadratic: at sf0.1 (40k clicks × 20k purchases) the plan DID
  * NOT FINISH in 10 minutes, where [[AsOfJoin.backward]] takes under a
  * second. This rule pattern-matches the DECORRELATED shape late in the
  * optimizer (by the user-rule batch the lateral join is already
  * rewritten, so the match target is the domain-join form, not the
  * `LateralJoin` node) and splices in the |L|+|R| single-exchange plan.
  *
  * Matched shape (produced by `DecorrelateInnerQuery` +
  * `RewriteLateralSubquery` + `InferWindowGroupLimit`):
  * {{{
  *   Join LeftOuter, (d <=> lts AND rkey = lkey)
  *     left
  *     Project [payload..., d, rkey]              // attribute-only
  *       Filter (rn <= 1)
  *         Window [row_number() OVER (PARTITION BY rkey, d
  *                 ORDER BY rt DESC, tie DESC) AS rn]
  *           (WindowGroupLimit / IsNotNull filters / attr Projects)*
  *             Join Inner, (rt <= d)
  *               Aggregate [lts0] [lts0 AS d]     // the outer-ts domain
  *               rightPlan
  * }}}
  * with the forward twin recognized as (rt >= d, ORDER BY rt ASC,
  * tie ASC). Direction, inclusivity, and the tie rule (DESC = greatest
  * wins backward, ASC = smallest wins forward) must all line up with
  * [[AsOfJoin]]'s contract or the node is left alone.
  *
  * Semantics preserved, including the edges:
  *   - null left keys: SQL `rkey = lkey` never matches them; AsOfJoin
  *     groups null keys together, so the replacement filters the RIGHT
  *     side to non-null keys (mirroring the isnotnull filter the
  *     optimizer already placed) — null-key left rows survive the left
  *     join with null payloads, matching nothing, exactly as written;
  *   - null left times: no right row satisfies `rt <= null`, and in the
  *     union-window plan a null-time left row sorts before every right
  *     row — null payload both ways;
  *   - the domain/key columns (`d`, `rkey`) remain part of the join's
  *     output contract: re-synthesized as `lts`/`lkey` on matched rows,
  *     null otherwise (matched ⇔ the right time rode back non-null —
  *     rights are non-null-filtered on time, so it is a faithful
  *     marker);
  *   - float/double time columns are refused (`<=>` on NaN vs sort
  *     order is a semantics the rewrite does not reproduce); timestamp,
  *     date, and integral times rewrite.
  *
  * Refusals keep the naive plan; any internal failure degrades
  * likewise (NonFatal → original node, logged). Disable with
  * `spark.graft.rewriteLateralAsOf=false`.
  */
object RewriteLateralAsOf extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewriteLateralAsOf"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    if (!plan.resolved) return plan
    plan.transformUp {
      case j @ Join(_, _, LeftOuter, Some(_), _) =>
        try rewrite(j).getOrElse(j)
        catch {
          case scala.util.control.NonFatal(e) =>
            logWarning(s"RewriteLateralAsOf left a join naive: $e")
            j
        }
    }
  }

  private def timeTypeOk(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | DateType => true
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Strip the operator noise between the Window and the domain join:
    * WindowGroupLimit nodes, filters made ONLY of `IsNotNull(attr)`
    * conjuncts (the optimizer's null prune), and attribute-only
    * Projects. Every dropped IsNotNull attribute accumulates into
    * `dropped`: after the full match, the caller verifies they
    * reference only the matched time/domain/key attributes — those are
    * implied by the join conditions the replacement reinstates, whereas
    * an IsNotNull on any OTHER column would be a genuine predicate the
    * rewrite must not discard. A bare boolean-attribute condition is
    * NOT peelable (it is a real filter, not null-prune noise) — the
    * peel stops at it and the surrounding match then refuses.
    */
  @scala.annotation.tailrec
  private def peel(p: LogicalPlan,
                   dropped: scala.collection.mutable.Buffer[Attribute])
  : LogicalPlan = p match {
    case WindowGroupLimit(_, _, _, _, child) => peel(child, dropped)
    case f @ Filter(cond, child) =>
      val cs = splitConjuncts(cond)
      if (cs.forall {
        case IsNotNull(_: Attribute) => true
        case _ => false
      }) {
        dropped ++= cs.collect { case IsNotNull(a: Attribute) => a }
        peel(child, dropped)
      } else f
    case Project(list, child) if list.forall(_.isInstanceOf[Attribute]) =>
      peel(child, dropped)
    case other => other
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val Join(left, lateral, LeftOuter, Some(cond), _) = j: @unchecked
    // outer condition: exactly (d <=> lts) AND (rkey = lkey)
    val conj = splitConjuncts(cond)
    if (conj.size != 2) return None
    def sides(a: Expression, b: Expression): Option[(Attribute, Attribute)] =
      (a, b) match {
        case (x: Attribute, y: Attribute)
            if lateral.outputSet.contains(x) && left.outputSet.contains(y) =>
          Some((x, y))
        case (x: Attribute, y: Attribute)
            if lateral.outputSet.contains(y) && left.outputSet.contains(x) =>
          Some((y, x))
        case _ => None
      }
    val (d, lts) = conj.collectFirst {
      case EqualNullSafe(a, b) => sides(a, b)
    }.flatten.getOrElse(return None)
    val (rkey, lkey) = conj.collectFirst {
      case EqualTo(a, b) => sides(a, b)
    }.flatten.getOrElse(return None)
    if (!timeTypeOk(d.dataType)) return None

    // the lateral subtree: attr-only Project over Filter(rn <= 1) over
    // the single-row_number Window
    val (projOut, rnFilter) = lateral match {
      case Project(list, f: Filter) if list.forall(_.isInstanceOf[Attribute]) =>
        (list.map(_.asInstanceOf[Attribute]), f)
      case f: Filter => (f.output, f)
      case _ => return None
    }
    val w = rnFilter.child match {
      case w: Window => w
      case _ => return None
    }
    val rnAttr = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => a.toAttribute
      case _ => return None
    }
    val top1 = rnFilter.condition match {
      case LessThanOrEqual(r: Attribute, Literal(1, IntegerType)) => r
      case EqualTo(r: Attribute, Literal(1, IntegerType)) => r
      case LessThan(r: Attribute, Literal(2, IntegerType)) => r
      case _ => return None
    }
    if (top1.exprId != rnAttr.exprId) return None
    if (w.partitionSpec.map {
      case a: Attribute => a.exprId
      case _ => return None
    }.toSet != Set(rkey.exprId, d.exprId)) return None

    // the idiom decorrelates in two variants: the ORDER BY lands either
    // on the Window itself (plain as-of, WindowGroupLimit inferred) or
    // — when the subquery carries a tolerance predicate — as a GLOBAL
    // Sort beneath an order-less Window (top-1 = first row in child
    // order; the rewrite makes that top-1 tiebreak-deterministic, which
    // is the intent the LIMIT 1 was generated from)
    val droppedNotNull = scala.collection.mutable.Buffer.empty[Attribute]
    val (orderSpec, belowOrder) =
      if (w.orderSpec.nonEmpty) (w.orderSpec, w.child)
      else peel(w.child, droppedNotNull) match {
        case s: Sort if s.global => (s.order, s.child)
        case _ => return None
      }
    // direction from the ORDER BY: (rt DESC, tie DESC) = backward,
    // (rt ASC, tie ASC) = forward; exactly one tiebreak
    val (rt, tie, fwd) = orderSpec match {
      case Seq(SortOrder(r: Attribute, Descending, _, _),
               SortOrder(t: Attribute, Descending, _, _)) => (r, t, false)
      case Seq(SortOrder(r: Attribute, Ascending, _, _),
               SortOrder(t: Attribute, Ascending, _, _)) => (r, t, true)
      case _ => return None
    }
    if (!timeTypeOk(rt.dataType)) return None

    // beneath: the domain join — Aggregate([g], [g AS d]) against the
    // right plan, on the directional inequality rt ◦ d plus an optional
    // merge_asof tolerance gate (rt within an interval of d)
    val domainJoin = peel(belowOrder, droppedNotNull) match {
      case dj: Join if dj.joinType == Inner => dj
      case _ => return None
    }
    // the peeled IsNotNull conjuncts must be exactly the null prunes the
    // matched join conditions imply (time, domain, key) — an IsNotNull
    // on any other column is a user predicate the replacement would
    // silently drop, so its presence refuses the whole match
    val impliedNotNull = Set(rt.exprId, d.exprId, rkey.exprId)
    if (droppedNotNull.exists(a => !impliedNotNull.contains(a.exprId)))
      return None
    def isDomainAgg(p: LogicalPlan): Boolean = p match {
      case Aggregate(Seq(g: Attribute), Seq(out), _, _) =>
        out match {
          case al @ Alias(ga: Attribute, _) =>
            ga.exprId == g.exprId && al.exprId == d.exprId
          case ga: Attribute => ga.exprId == g.exprId && ga.exprId == d.exprId
          case _ => false
        }
      case _ => false
    }
    val rightPlan =
      if (isDomainAgg(domainJoin.left)) domainJoin.right
      else if (isDomainAgg(domainJoin.right)) domainJoin.left
      else return None
    val dconds = domainJoin.condition match {
      case Some(c) => splitConjuncts(c)
      case None => return None
    }
    def isBase(e: Expression): Boolean = e match {
      case LessThanOrEqual(a: Attribute, b: Attribute) =>
        (!fwd && a.exprId == rt.exprId && b.exprId == d.exprId) ||
          (fwd && a.exprId == d.exprId && b.exprId == rt.exprId)
      case GreaterThanOrEqual(a: Attribute, b: Attribute) =>
        (fwd && a.exprId == rt.exprId && b.exprId == d.exprId) ||
          (!fwd && a.exprId == d.exprId && b.exprId == rt.exprId)
      case _ => false
    }
    // `rt >= d - tol` (backward) / `rt <= d + tol` (forward): the SQL
    // spelling of merge_asof's tolerance. Day-time intervals only — a
    // year-month interval has no fixed microsecond width.
    def intervalMicros(e: Expression): Option[Long] = e match {
      case TimestampAddInterval(a: Attribute,
          Literal(m: Long, _: DayTimeIntervalType), _)
          if a.exprId == d.exprId => Some(m)
      case _ => None
    }
    def asTolerance(e: Expression): Option[Long] = e match {
      case GreaterThanOrEqual(a: Attribute, x) if !fwd &&
          a.exprId == rt.exprId =>
        intervalMicros(x).filter(_ < 0).map(-_)
      case LessThanOrEqual(x, a: Attribute) if !fwd &&
          a.exprId == rt.exprId =>
        intervalMicros(x).filter(_ < 0).map(-_)
      case LessThanOrEqual(a: Attribute, x) if fwd &&
          a.exprId == rt.exprId =>
        intervalMicros(x).filter(_ > 0)
      case GreaterThanOrEqual(x, a: Attribute) if fwd &&
          a.exprId == rt.exprId =>
        intervalMicros(x).filter(_ > 0)
      case _ => None
    }
    val (baseConds, rest) = dconds.partition(isBase)
    if (baseConds.size != 1) return None
    val tolerance: Option[Long] = rest match {
      case Seq() => None
      case Seq(t) => Some(asTolerance(t).getOrElse(return None))
      case _ => return None
    }
    // tolerance arithmetic happens in microseconds — only true
    // timestamp columns carry that unit
    if (tolerance.isDefined &&
      !Seq[DataType](TimestampType, TimestampNTZType).contains(rt.dataType))
      return None
    // everything the Window needs must come from the right plan
    val rOut = rightPlan.outputSet
    if (!rOut.contains(rt) || !rOut.contains(tie) || !rOut.contains(rkey))
      return None
    // the lateral's outputs: payload attrs from the right plan, plus
    // the synthesized d / rkey columns
    val payload = projOut.filter(a =>
      rOut.contains(a) && a.exprId != rt.exprId)
    if (projOut.exists(a => !rOut.contains(a) &&
      a.exprId != d.exprId && a.exprId != rkey.exprId)) return None

    // ---- build the replacement with uniquely-named frames ----
    // POSITIONAL renames (toDF), never exprId-referencing selects: when
    // this rule composes on top of its own fresh splice (the two-lateral
    // nearest spelling rewrites the backward lateral first, then matches
    // the forward join whose LEFT is that splice), re-analysis of the
    // spliced subtree can re-alias its output ids — a select by the old
    // ids then fails analysis (MISSING_ATTRIBUTES) and the forward leg
    // silently kept its quadratic domain join. Output POSITIONS survive
    // re-aliasing; ids do not.
    val spark = SparkSession.active
    val lNames = left.output.indices.map(i => s"__graft_asof_l_$i")
    val leftDf = GraftColumnBridge.ofRows(spark, left).toDF(lNames: _*)
    val lKeyName = lNames(left.output.indexWhere(_.exprId == lkey.exprId))
    val lTsName = lNames(left.output.indexWhere(_.exprId == lts.exprId))
    val rPosNames = rightPlan.output.indices.map(i => s"__graft_asof_rp_$i")
    val rightDfAll =
      GraftColumnBridge.ofRows(spark, rightPlan).toDF(rPosNames: _*)
    def posName(a: Attribute): String =
      rPosNames(rightPlan.output.indexWhere(_.exprId == a.exprId))
    // SQL equality never matches null keys; AsOfJoin groups them — the
    // right side must shed them (left rows keep their outer-join nulls)
    val rAttrs = (Seq(rkey, rt, tie) ++ payload)
      .foldLeft(Seq.empty[Attribute]) { (acc, a) =>
        if (acc.exists(_.exprId == a.exprId)) acc else acc :+ a
      }
    // AsOfJoin takes ONE key name for both frames — the right key
    // borrows the left frame's name
    val rNames = rAttrs.zipWithIndex.map { case (a, i) =>
      if (a.exprId == rkey.exprId) lKeyName else s"__graft_asof_r_$i"
    }
    def rName(a: Attribute): String =
      rNames(rAttrs.indexWhere(_.exprId == a.exprId))
    val rightDf = rightDfAll
      .filter(col(posName(rkey)).isNotNull)
      .select(rAttrs.zip(rNames).map {
        case (a, nm) => col(posName(a)).as(nm)
      }: _*)
    val pay = (Seq(rName(rt)) ++ payload.map(rName)).distinct
    val joined = (fwd, tolerance) match {
      case (true, None) => AsOfJoin.forward(leftDf, rightDf, lKeyName,
        lTsName, rName(rt), pay, rName(tie))
      case (false, None) => AsOfJoin.backward(leftDf, rightDf, lKeyName,
        lTsName, rName(rt), pay, rName(tie))
      case (true, Some(t)) => AsOfJoin.forwardWithin(leftDf, rightDf,
        lKeyName, lTsName, rName(rt), pay, rName(tie), t)
      case (false, Some(t)) => AsOfJoin.backwardWithin(leftDf, rightDf,
        lKeyName, lTsName, rName(rt), pay, rName(tie), t)
    }
    // SQL's inequality never matches a NULL left time (`rt >= null` is
    // never true), but AsOfJoin sorts a null `_t` FIRST — harmless
    // backward (nothing precedes), but the FORWARD frame would see
    // every following right row. Gate every output on a non-null left
    // time so both directions keep the SQL answer.
    val valid = col(lTsName).isNotNull
    val matched = valid && col(s"asof_${rName(rt)}").isNotNull
    var res = joined
    val outCols: Seq[Column] =
      lNames.map(col) ++
        projOut.map { a =>
          if (a.exprId == d.exprId) fwhen(matched, col(lTsName)).as("__d")
          else if (a.exprId == rkey.exprId)
            fwhen(matched, col(lKeyName)).as("__rk")
          else if (a.exprId == rt.exprId)
            fwhen(valid, col(s"asof_${rName(rt)}")).as("__rt")
          else fwhen(valid, col(s"asof_${rName(a)}")).as(s"__p_${rName(a)}")
        }
    res = res.select(outCols: _*)
    val analyzed = res.queryExecution.optimizedPlan
    if (analyzed.output.size != left.output.size + projOut.size) return None
    val (lGot, rGot) = analyzed.output.splitAt(left.output.size)
    val restored = left.output.zip(lGot).map { case (orig, got) =>
      if (orig.exprId == got.exprId) got
      else Alias(got, orig.name)(exprId = orig.exprId)
    }
    val laterals = projOut.zip(rGot).map { case (orig, got) =>
      Alias(got, orig.name)(exprId = orig.exprId)
    }
    logInfo(s"rewrote LATERAL-LIMIT-1 ${if (fwd) "forward" else "backward"} " +
      s"as-of on key=${rkey.name} time=${rt.name} to the union-window plan")
    Some(Project(restored ++ laterals, analyzed))
  }
}

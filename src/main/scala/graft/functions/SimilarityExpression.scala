package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tier-3 formulation of the reference's product-similarity scorer
  * (SURVEY §2.8; reference `etl/orders_etl.py:118-147`): a native 6-ary
  * Catalyst expression with codegen, semantically identical — bit-for-bit,
  * spec-enforced — to the composed column expression
  * [[graft.etl.Similarity.scoreExpr]] and the reference's golden values,
  * including the cross-wired weight constants and Python banker's
  * rounding (HALF_EVEN at 5 decimals).
  *
  * Null semantics: a null group/manufacturer on either side contributes 0
  * (pandas NaN == x is False); a null price on either side nulls the whole
  * score (null propagates through the arithmetic in the composed tier).
  *
  * Args: (price, goods_group, manufacturer, t_price, t_group, t_mfr).
  */
case class SimilarityScore(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(DoubleType, StringType, StringType,
      DoubleType, StringType, StringType)
    if (children.length != 6)
      TypeCheckResult.TypeCheckFailure("similarity_score expects 6 arguments")
    else if (children.map(_.dataType) != expected)
      TypeCheckResult.TypeCheckFailure(
        s"similarity_score requires (DOUBLE, STRING, STRING, DOUBLE, STRING, " +
          s"STRING), got ${children.map(_.dataType.catalogString).mkString(", ")}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val price = children(0).eval(input)
    val tPrice = children(3).eval(input)
    if (price == null || tPrice == null) return null
    val group = children(1).eval(input)
    val mfr = children(2).eval(input)
    val tGroup = children(4).eval(input)
    val tMfr = children(5).eval(input)
    var score = 0.0
    if (group != null && tGroup != null && group == tGroup) score += 0.5
    if (mfr != null && tMfr != null && mfr == tMfr) score += 0.2
    val p = price.asInstanceOf[Double]
    val tp = tPrice.asInstanceOf[Double]
    score += (1.0 - math.abs(tp - p) / math.max(tp, p)) * 0.3
    SimilarityScore.round5(score)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val Seq(price, group, mfr, tPrice, tGroup, tMfr) =
      children.map(_.genCode(ctx))
    val score = ctx.freshName("score")
    val cls = SimilarityScore.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        |${price.code}
        |${tPrice.code}
        |boolean ${ev.isNull} = ${price.isNull} || ${tPrice.isNull};
        |double ${ev.value} = 0.0;
        |if (!${ev.isNull}) {
        |  ${group.code}
        |  ${mfr.code}
        |  ${tGroup.code}
        |  ${tMfr.code}
        |  double $score = 0.0;
        |  if (!${group.isNull} && !${tGroup.isNull} &&
        |      ${group.value}.equals(${tGroup.value})) $score += 0.5;
        |  if (!${mfr.isNull} && !${tMfr.isNull} &&
        |      ${mfr.value}.equals(${tMfr.value})) $score += 0.2;
        |  $score += (1.0 - Math.abs(${tPrice.value} - ${price.value})
        |    / Math.max(${tPrice.value}, ${price.value})) * 0.3;
        |  ${ev.value} = $cls.round5($score);
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimilarityScore =
    copy(children = newChildren)

  override def prettyName: String = "similarity_score"
}

object SimilarityScore {
  /** Python round() ≡ HALF_EVEN at 5 decimals — shared by eval and the
    * generated code so the two paths cannot diverge.
    */
  def round5(x: Double): Double =
    BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_EVEN).doubleValue
}

object SimilarityFunctions {
  /** Column-API wrapper for [[SimilarityScore]]. */
  def similarityScore(price: Column, group: Column, mfr: Column,
                      tPrice: Column, tGroup: Column, tMfr: Column): Column =
    GraftColumnBridge.column(SimilarityScore(
      Seq(price, group, mfr, tPrice, tGroup, tMfr)
        .map(GraftColumnBridge.expression)))
}

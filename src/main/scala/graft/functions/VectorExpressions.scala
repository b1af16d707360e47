package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-embedding dot product.
  *
  * The composable formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * allocates an intermediate 64-element array per evaluated pair — at N²
  * pair counts (brute-force ANN, near-dup detection) the allocation
  * dominates the arithmetic. This expression generates a tight primitive
  * loop (no allocation, stays inside whole-stage codegen) and computes the
  * identical sequential double-precision fold, so results are bit-for-bit
  * the same as the higher-order-function version and the DuckDB oracle's
  * `list_dot_product` on DOUBLE[].
  */
case class FloatArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_array_dot requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  // Mismatched lengths yield null — the same answer the zip_with/aggregate
  // fold gives (zip_with null-pads, the fold collapses to null), so a
  // corrupt/truncated embedding surfaces as null rather than a
  // plausible-looking partial score.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "float_array_dot"
}

object VectorExpressions {
  /** Column-API wrapper for [[FloatArrayDot]]. */
  def floatDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatArrayDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

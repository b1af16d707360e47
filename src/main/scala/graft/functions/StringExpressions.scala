package graft.functions

import org.apache.commons.text.StringEscapeUtils
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** General HTML-entity unescape as a native codegen'd expression (the
  * reference applies Python `html.unescape` per value,
  * `etl/orders_etl.py:187`). The narrow regexp chain in
  * [[graft.etl.CleanNames.htmlUnescape]] stays the oracle-parity path
  * (DuckDB can mirror it); this expression is the full-fidelity operator
  * covering every named/numeric entity via commons-text (shipped in
  * Spark's own classpath).
  */
case class HtmlUnescape(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_unescape requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      StringEscapeUtils.unescapeHtml4(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "UTF8String.fromString(org.apache.commons.text.StringEscapeUtils" +
        s".unescapeHtml4($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): HtmlUnescape =
    copy(child = newChild)

  override def prettyName: String = "html_unescape"
}

/** Unicode canonical composition (NFC) as a native codegen'd expression —
  * the first normalization every multilingual corpus pass applies, so the
  * same visible string has ONE byte encoding before hashing/dedup/equality
  * (é as U+00E9 vs e+U+0301 would otherwise defeat every exact-dedup
  * operator in the engine). Backed by `java.text.Normalizer` (the JDK's
  * ICU-derived tables); DuckDB's `nfc_normalize` implements the same
  * Unicode standard, which is what makes the operator oracle-checkable.
  */
case class UnicodeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_nfc requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNfc =
    copy(child = newChild)

  override def prettyName: String = "unicode_nfc"
}

object StringExpressions {
  def htmlUnescape(c: Column): Column =
    GraftColumnBridge.column(HtmlUnescape(GraftColumnBridge.expression(c)))

  def unicodeNfc(c: Column): Column =
    GraftColumnBridge.column(UnicodeNfc(GraftColumnBridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a LITERAL token set — the inner
  * loop of the stopword-ratio quality rule and every language-ID profile
  * score, i.e. an expression the corpus SCAN evaluates once per document
  * per profile at 100 TB.
  *
  * The built-in spelling `size(filter(words, _.isin(set)))` evaluates an
  * interpreted higher-order lambda per element, allocates the filtered
  * array only to take its size, and breaks the whole-stage-codegen span
  * around it (the same HOF cost class the r13 ×64 probe exposed in the
  * range machinery). This walks the UTF8String array against one static
  * hash set with no allocation, inside codegen.
  *
  * Semantics are EXACTLY the built-in spelling's: null array → null,
  * null elements never match, each occurrence counts (term frequency,
  * not distinct) — so swapping it under an existing oracle key changes
  * no value.
  */
case class TokenSetCount(child: Expression, tokens: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set_count requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](tokens.size * 2)
    tokens.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var i = 0
    var c = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set,
      "java.util.HashSet<UTF8String>")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $cnt = 0;
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i) && $setRef.contains($c.getUTF8String($i))) {
         |    $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
  : TokenSetCount = copy(child = newChild)

  override def prettyName: String = "token_set_count"
}

object TokenSetCountFunctions {
  /** `token_set_count(words, set)` as a Column. */
  def tokenSetCount(words: Column, tokens: Seq[String]): Column =
    GraftColumnBridge.column(
      TokenSetCount(GraftColumnBridge.expression(words), tokens))
}

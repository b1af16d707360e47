package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Count of DISTINCT n-token-window fingerprints (md5 of the space-joined
  * window) present in a fixed fingerprint set — the per-row kernel of the
  * streaming benchmark-decontamination gate.
  *
  * The Column spelling —
  * `size(array_intersect(array_distinct(transform(shingles, md5)), bench))`
  * — pays three interpreted higher-order/collection passes per row AND
  * rebuilds a hash set from the benchmark array on EVERY row
  * (ArrayIntersect keeps no state between rows); measured ~0.6 s/batch
  * over the stateless-filter baseline at sf0.1. This walks the word
  * array once per row against ONE shared hash set (a codegen reference
  * object, built once per executor), inside whole-stage codegen.
  *
  * Semantics match the replaced spelling exactly: null words → null;
  * windows are space-joined n-grams (fewer than n words → zero windows);
  * each DISTINCT matching fingerprint counts once.
  */
case class SpanHitCount(child: Expression, n: Int, fps: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_hit_count requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](fps.size * 2)
    fps.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    SpanHitCountImpl.compute(input.asInstanceOf[ArrayData], n, set)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("benchFps", set,
      "java.util.HashSet<String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SpanHitCountImpl.compute($c, $n, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : SpanHitCount = copy(child = newChild)

  override def prettyName: String = "span_hit_count"
}

object SpanHitCountImpl {
  def compute(words: ArrayData, n: Int,
              set: java.util.HashSet[String]): Long = {
    val total = words.numElements()
    if (total < n || set.isEmpty) return 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder()
    var hits: java.util.HashSet[String] = null
    var i = 0
    while (i <= total - n) {
      sb.setLength(0)
      // concat_ws semantics: a null element is skipped WITH its
      // separator (concat_ws(' ', 'a', null, 'b') = "a b")
      var first = true
      var o = 0
      while (o < n) {
        if (!words.isNullAt(i + o)) {
          if (!first) sb.append(' ')
          sb.append(words.getUTF8String(i + o))
          first = false
        }
        o += 1
      }
      val d = md.digest(sb.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new java.lang.StringBuilder(32)
      var b = 0
      while (b < 16) {
        val v = d(b) & 0xff
        hex.append(Character.forDigit(v >>> 4, 16))
        hex.append(Character.forDigit(v & 0xf, 16))
        b += 1
      }
      val h = hex.toString
      if (set.contains(h)) {
        if (hits == null) hits = new java.util.HashSet[String]()
        hits.add(h)
      }
      i += 1
    }
    if (hits == null) 0L else hits.size.toLong
  }
}

object SpanHitCountFunctions {
  /** `span_hit_count(words, n, fps)` as a Column. */
  def spanHitCount(words: Column, n: Int, fps: Seq[String]): Column =
    GraftColumnBridge.column(
      SpanHitCount(GraftColumnBridge.expression(words), n, fps))
}

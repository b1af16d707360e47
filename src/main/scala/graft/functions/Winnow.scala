package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03;
  * the MOSS algorithm): hash every k-gram of the text, slide a window of
  * `w` consecutive k-gram hashes, keep the minimum of each window, and
  * return the DISTINCT selected hashes sorted ascending. The guarantee
  * that makes this the standard substring-level dedup primitive: any two
  * documents sharing a substring of at least `w + k − 1` characters share
  * at least one fingerprint — so a fingerprint equi-join finds every such
  * pair, and the expected fingerprint density is only 2/(w+1) of the
  * k-gram count.
  *
  * Cost shape (the reason this is a native expression, not a HOF chain):
  * one O(n) Rabin–Karp rolling pass over the code points (same Base/Mod
  * as [[RollingHashImpl]] — each k-gram hash equals the plain polynomial
  * fold the DuckDB oracle recomputes per gram), then one O(m) monotonic
  * deque for the sliding minimum. A `transform(sequence(...))` HOF
  * version is O(m·w) interpreted; this is O(n) codegen'd.
  *
  * Set semantics: selection positions are discarded and duplicates
  * collapse (dedup wants the fingerprint SET; position-aware robust
  * winnowing matters only for match LOCATION). Documents shorter than k
  * code points yield an empty set; with fewer than w k-grams the single
  * window spans them all.
  */
object WinnowImpl {
  import RollingHashImpl.{Base, Mod}

  def compute(s: String, k: Int, w: Int): ArrayData = {
    val cps = s.codePoints().toArray
    val n = cps.length
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    // B^(k-1) mod M, for the rolling removal of the departing code point
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = pow * Base % Mod; i += 1 }
    // k-gram hashes: h(i+1) = (h(i) − cp_i·B^(k−1))·B + cp_(i+k)  (mod M)
    val h = new Array[Long](m)
    var acc = 0L
    i = 0
    while (i < k) { acc = (acc * Base + cps(i)) % Mod; i += 1 }
    h(0) = acc
    i = 1
    while (i < m) {
      acc = ((acc - cps(i - 1) * pow % Mod + Mod) % Mod * Base +
        cps(i + k - 1)) % Mod
      h(i) = acc
      i += 1
    }
    // sliding min over windows of w hashes (one window when m < w):
    // monotonic deque of candidate indices, increasing hash value
    val windows = math.max(m - w + 1, 1)
    val effW = math.min(w, m)
    val deque = new Array[Int](m)
    var (head, tail) = (0, 0) // [head, tail) holds candidate indices
    val selected = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < m) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - effW) head += 1
      if (i >= effW - 1) selected.add(h(deque(head)))
      i += 1
    }
    require(selected.size <= windows, "winnow invariant violated")
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "winnow requires k >= 1 and w >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowImpl.compute(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowImpl.compute($c.toString(), $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

object WinnowFunctions {
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(
      WinnowFingerprints(GraftColumnBridge.expression(c), k, w))
}

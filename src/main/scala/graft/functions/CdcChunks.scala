package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the Rabin-fingerprint boundary rule behind
  * LBFS/restic/borg-style deduplicating storage): a chunk boundary falls
  * AFTER position i whenever the rolling hash of the last `k` code points
  * satisfies `h mod 2^bits == 0`, giving expected chunk length 2^bits
  * regardless of where content sits in the stream. The property that
  * matters at 100 TB: boundaries depend only on LOCAL content, so an
  * insertion near the front of a document shifts every byte offset but
  * re-aligns the chunk sequence within one chunk — identical trailing
  * content re-chunks into identical (hash-addressable) chunks, which is
  * what makes cross-document storage dedup work. Fixed-size splitting has
  * zero such overlap after any single-byte insert.
  *
  * Same polynomial Base/Mod as [[RollingHashImpl]], rolled in O(n) (one
  * removal per step, like [[WinnowImpl]]); boundaries at i ∈ [k, n−1] so
  * no empty chunk is ever produced. Returns the chunk STRINGS in order
  * (empty input → empty array); the basic variant — no min/max clamps,
  * whose sequential eligibility rule is what a DuckDB oracle cannot
  * replay positionally.
  */
object CdcChunksImpl {
  import RollingHashImpl.{Base, Mod}

  def compute(s: String, k: Int, bits: Int): ArrayData = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << bits) - 1
    val bounds = scala.collection.mutable.ArrayBuffer[Int]()
    if (n > k) {
      var pow = 1L
      var i = 0
      while (i < k - 1) { pow = pow * Base % Mod; i += 1 }
      var acc = 0L
      i = 0
      while (i < k) { acc = (acc * Base + cps(i)) % Mod; i += 1 }
      // acc now hashes cps[0..k-1], the window ENDING at position k
      if ((acc & mask) == 0L) bounds += k
      i = k + 1
      while (i < n) { // windows ending at i = cps[i-k..i-1]
        acc = ((acc - cps(i - k - 1) * pow % Mod + Mod) % Mod * Base +
          cps(i - 1)) % Mod
        if ((acc & mask) == 0L) bounds += i
        i += 1
      }
    }
    val edges = 0 +: bounds.toSeq :+ n
    val chunks = new Array[Any](edges.length - 1)
    var j = 0
    while (j < chunks.length) {
      chunks(j) = UTF8String.fromString(
        new String(cps, edges(j), edges(j + 1) - edges(j)))
      j += 1
    }
    new GenericArrayData(chunks)
  }
}

case class CdcChunks(child: Expression, k: Int, bits: Int)
    extends UnaryExpression {
  require(k >= 1 && bits >= 1 && bits <= 30,
    "cdc_chunks requires k >= 1 and bits in [1, 30]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcChunksImpl.compute(input.asInstanceOf[UTF8String].toString, k, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunksImpl.compute($c.toString(), $k, $bits)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunksFunctions {
  def cdcChunks(c: Column, k: Int, bits: Int): Column =
    GraftColumnBridge.column(CdcChunks(GraftColumnBridge.expression(c), k, bits))
}

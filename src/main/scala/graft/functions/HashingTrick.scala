package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Feature hashing ("hashing trick", Weinberger et al. 2009 — the
  * HashingVectorizer): text → fixed-`dim` dense vector with NO vocabulary.
  * Each whitespace token t lands at index `md5(t)[0..3] mod dim` with sign
  * `±1` from md5 nibble 8, accumulating signed counts. The point at
  * corpus scale: featurization becomes a NARROW MAP — no vocabulary
  * build, no explode, no shuffle, output size fixed per row — where a
  * vocabulary-based vectorizer needs a full corpus pass plus a broadcast
  * dictionary that grows with the data. The signed hash keeps collision
  * noise zero-mean (two colliding tokens cancel half the time instead of
  * always inflating).
  *
  * Hash choice is md5-prefix — the engine's cross-engine convention
  * (sampling, LSH, MinHash all use it) — so a DuckDB oracle reproduces
  * every component exactly.
  */
object HashingTrickOps {

  // per-row MessageDigest.getInstance would mean a provider lookup +
  // allocation on every row of a scan-projection hot path
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hashFeatures(text: UTF8String, dim: Int): ArrayData = {
    val vec = new Array[Double](dim)
    val md = md5.get()
    // operate on the UTF-8 bytes directly (no String round-trip):
    // tokens split on the 0x20 byte, which never occurs inside a
    // multi-byte UTF-8 sequence, so byte-level splitting == the
    // char-level split the oracle replays
    val bytes = text.getBytes
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.update(bytes, start, i - start)
        val d = md.digest()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val idx = (h % dim).toInt
        val sign = if (((d(4) >> 4) & 0x1) == 0) 1.0 else -1.0
        vec(idx) += sign
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(vec)
  }
}

/** `hashing_features(text, dim)` → ARRAY<DOUBLE>[dim]. Codegen-native so
  * the per-row feature map stays inside WholeStageCodegen.
  */
case class HashingTrick(child: Expression, dim: Int)
  extends UnaryExpression {

  require(dim >= 2 && dim <= (1 << 22),
    s"hashing_features: dim must be in [2, 2^22], got $dim")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashing_features requires a STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(text: Any): Any =
    HashingTrickOps.hashFeatures(text.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.HashingTrickOps.hashFeatures($t, $dim)")

  override protected def withNewChildInternal(c: Expression): HashingTrick =
    copy(child = c)

  override def prettyName: String = "hashing_features"
}

object HashingTrickFunctions {
  def hashingFeatures(text: Column, dim: Int): Column =
    GraftColumnBridge.column(
      HashingTrick(GraftColumnBridge.expression(text), dim))
}

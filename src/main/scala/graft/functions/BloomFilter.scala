package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter runtime join pruning — the semi-join reduction a shuffle
  * join needs at 100 TB when the dimension side is too big to BROADCAST
  * but its key SET still fits a few megabytes of bits: build the filter
  * as a regular aggregation over the dim keys (map-side partials, only
  * fixed-size bit arrays shuffle), broadcast the one-row result, and
  * probe it in the fact scan's filter so non-matching rows die BEFORE
  * the join exchange instead of after it. Spark's own runtime filters
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) apply the same
  * idea behind the optimizer's back; this is the explicit, tunable
  * operator form with the filter a first-class value the pipeline can
  * persist or reuse.
  *
  * Correctness contract: the filter is ONE-SIDED — `mightContain` never
  * returns false for an inserted value (no false negatives), so pruning
  * with it loses no rows; false positives merely survive until the exact
  * join behind it. Any (numBits, numHashes) therefore yields exactly the
  * plain join's result — the parameters tune COST, not answers — which
  * is what makes [[graft.ops.RuntimeFilter.bloomPrunedSemiJoin]]
  * oracle-checkable against a plain `IN` subquery.
  *
  * Serialized layout (probe format == aggregation buffer, so partials
  * merge by OR-ing bytes and `eval` is a copy): 1-byte format version,
  * 3-byte big-endian numHashes, 8-byte big-endian numBits, then the bit
  * array — bit `i` lives in byte `12 + (i >> 3)` at mask `1 << (i & 7)`.
  * The version byte repurposes numHashes' always-zero top byte, so the
  * buffer size is unchanged; it exists because the bit POSITIONS are
  * part of the format — when the h1 derivation changed from raw-value to
  * a full avalanche mix, any filter bytes persisted under the old layout
  * would probe at different positions and silently return false
  * negatives, violating the one-sided contract. Probing or inserting
  * into a buffer with a different version now fails loudly instead
  * ("rebuild with graft_bloom_agg").
  */
object BloomFilterOps {

  /** Second hash for double hashing (Kirsch–Mitzenmacher: position i is
    * `h1 + i·h2`): a splitmix64-style finalizer of the input, forced odd
    * so the probe stride never degenerates to 0.
    */
  def mix(v: Long): Long = {
    var h = v * 0x9E3779B97F4A7C15L
    h ^= (h >>> 32)
    h | 1L
  }

  /** First hash: full splitmix64 finalizer. The Scala API pre-hashes keys
    * with xxhash64, but the SQL function `graft_bloom_agg` accepts ANY
    * BIGINT — with a raw `h1 = v`, sequential keys (ids 1..n) cluster
    * their first probe positions and the false-positive rate blows past
    * the ~10 bits/key rule of thumb (cost, never correctness — the filter
    * stays one-sided). A full avalanche on h1 restores uniform spread for
    * arbitrary key distributions.
    */
  def mixH1(v: Long): Long = {
    var h = v + 0x9E3779B97F4A7C15L
    h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  def headerBytes: Int = 12

  /** Bit-position layout version: 1 was the unmixed-h1 era (never
    * tagged — its byte 0 was the zero top byte of numHashes), 2 is the
    * avalanche-mixed h1.
    */
  val FormatVersion: Byte = 2

  /** Two comparisons per call — deliberately cheap enough to leave in
    * the per-row probe path (it is dwarfed by the `numHashes` random
    * byte reads that follow) rather than engineering a validate-once
    * state for the codegen'd expression. The length guard turns a
    * truncated/empty BINARY (corrupt persisted filter, `X''` from SQL)
    * into the same loud message instead of a raw index error.
    */
  def checkFormat(buf: Array[Byte]): Unit =
    require(buf.length >= headerBytes && buf(0) == FormatVersion,
      s"bloom buffer invalid (${buf.length} bytes, format " +
        s"${if (buf.isEmpty) "?" else buf(0).toString} != $FormatVersion) — " +
        "the bit layout changed; rebuild the filter with graft_bloom_agg")

  def bufferSize(numBits: Long): Int =
    headerBytes + (((numBits + 7) / 8)).toInt

  def newBuffer(numBits: Long, numHashes: Int): Array[Byte] = {
    require((numHashes >>> 24) == 0, s"numHashes $numHashes out of range")
    val buf = new Array[Byte](bufferSize(numBits))
    buf(0) = FormatVersion; buf(1) = (numHashes >>> 16).toByte
    buf(2) = (numHashes >>> 8).toByte; buf(3) = numHashes.toByte
    var i = 0
    while (i < 8) { buf(4 + i) = (numBits >>> (56 - 8 * i)).toByte; i += 1 }
    buf
  }

  def put(buf: Array[Byte], v: Long): Unit = {
    checkFormat(buf)
    val numHashes = readNumHashes(buf)
    val numBits = readNumBits(buf)
    val h1 = mixH1(v)
    val h2 = mix(v)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      val b = headerBytes + (pos >> 3).toInt
      buf(b) = (buf(b) | (1 << (pos & 7).toInt)).toByte
      i += 1
    }
  }

  def readNumHashes(buf: Array[Byte]): Int =
    ((buf(1) & 0xff) << 16) | ((buf(2) & 0xff) << 8) | (buf(3) & 0xff)

  def readNumBits(buf: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (buf(4 + i) & 0xffL); i += 1 }
    v
  }

  /** The probe — also the codegen target of [[BloomMightContain]], so it
    * works directly on the serialized bytes: no deserialization, no
    * per-row allocation, `numHashes` byte reads.
    */
  def mightContain(buf: Array[Byte], v: Long): Boolean = {
    checkFormat(buf)
    val numHashes = readNumHashes(buf)
    val numBits = readNumBits(buf)
    val h1 = mixH1(v)
    val h2 = mix(v)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      if ((buf(headerBytes + (pos >> 3).toInt) & (1 << (pos & 7).toInt)) == 0)
        return false
      i += 1
    }
    true
  }

  /** OR b into a (same numBits/numHashes header required). */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    checkFormat(a); checkFormat(b)
    require(a.length == b.length &&
      readNumBits(a) == readNumBits(b) &&
      readNumHashes(a) == readNumHashes(b),
      "bloom merge: mismatched filter shapes")
    var i = headerBytes
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }
}

/** Aggregate that builds the filter over a LONG column (hash non-long
  * keys first — `xxhash64(key)` — so one filter shape serves every key
  * type). Map-side partials are the fixed-size byte buffer; merge is a
  * byte-wise OR, so the result is identical under any partitioning and
  * merge order — the property that keeps downstream pruning
  * deterministic and oracle-checkable.
  */
case class BloomFilterBuildAgg(
    child: Expression,
    numBits: Long,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(numBits > 0 && numBits <= (1L << 33),
    s"graft_bloom_agg: numBits must be in (0, 2^33], got $numBits")
  require(numHashes > 0 && numHashes <= 16,
    s"graft_bloom_agg: numHashes must be in [1, 16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg requires a BIGINT value (hash keys first), got " +
        child.dataType.catalogString)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] =
    BloomFilterOps.newBuffer(numBits, numHashes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomFilterOps.put(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    BloomFilterOps.merge(a, b)

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomFilterBuildAgg = copy(child = c(0))

  override def prettyName: String = "graft_bloom_agg"
}

/** Scalar probe: `graft_bloom_contains(bloom BINARY, value BIGINT)`.
  * Codegen-native (stays inside WholeStageCodegen — this sits in the hot
  * fact-scan filter, the one place an eval-only fallback would hurt) and
  * reads the serialized bits directly, no per-row deserialization.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires (BINARY, BIGINT), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(bloom: Any, v: Any): Any =
    BloomFilterOps.mightContain(
      bloom.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) =>
      s"graft.functions.BloomFilterOps.mightContain($b, $v)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomMightContain = copy(l, r)

  override def prettyName: String = "graft_bloom_contains"
}

object BloomFilterFunctions {

  /** `bloomAgg(xxhash64(key), numBits, numHashes)` inside `.agg`. */
  def bloomAgg(value: Column, numBits: Long, numHashes: Int): Column =
    GraftColumnBridge.column(
      BloomFilterBuildAgg(GraftColumnBridge.expression(value),
        numBits, numHashes).toAggregateExpression())

  def bloomContains(bloom: Column, value: Column): Column =
    GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(bloom),
        GraftColumnBridge.expression(value)))
}

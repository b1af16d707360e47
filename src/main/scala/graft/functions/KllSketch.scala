package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL-style streaming quantile sketch (Karnin–Lang–Liberty 2016,
  * simplified): a level ladder of sample buffers where an item at level i
  * represents 2^i inputs. Level 0 absorbs raw values; a full level sorts
  * and promotes every other element (alternating offset per level, so
  * which half survives alternates deterministically — reproducible runs,
  * no RNG in executors), doubling the survivors' weight. Capacities decay
  * geometrically toward the bottom (`max(⌈k·(2/3)^(top−i)⌉, 8)`), giving
  * O(k·log(n/k)) state for ANY n — the reason this is a mergeable
  * aggregate and exact percentiles are not: only fixed-size summaries
  * ever shuffle, map-side partials do the data-sized work.
  *
  * Weight conservation is an invariant: a compaction promotes pairs (an
  * odd element stays behind), so Σ item·2^level == exact input count at
  * all times — [[KllState.totalWeight]] is checked in specs and implied
  * by the certification query's use of `n`.
  *
  * The estimate contract (what the certification query pins): for each
  * requested rank fraction q, the reported value's true rank lies within
  * a small multiple of n/k of q·n. Deterministic-coin KLL loses the
  * randomized worst-case proof but observes the same ~1/k error
  * empirically; the query certifies a generous 5% rank envelope at
  * k=200 (~25× observed slack) the same way heavy_hitters certifies
  * Misra–Gries: both engines emit the bound CHECK, not the
  * engine-specific internals.
  */
object Kll {

  final class KllState(val k: Int) {
    val levels: ArrayBuffer[ArrayBuffer[Double]] =
      ArrayBuffer(ArrayBuffer.empty[Double])
    /** Per-level compaction coin, toggled on every compaction — the
      * deterministic stand-in for KLL's random offset: successive
      * compactions of one level alternate which half survives, so the
      * rank bias of one pass cancels on the next instead of compounding.
      */
    val flips: ArrayBuffer[Int] = ArrayBuffer(0)
    var count: Long = 0L

    def capacity(level: Int): Int = {
      val top = levels.length - 1
      math.max(math.ceil(k * math.pow(2.0 / 3.0, top - level)).toInt, 8)
    }

    def totalWeight: Long = {
      var s = 0L
      var i = 0
      while (i < levels.length) { s += levels(i).length.toLong << i; i += 1 }
      s
    }
  }

  def insert(st: KllState, v: Double): Unit = {
    st.levels(0) += v
    st.count += 1
    compress(st)
  }

  /** Cascade compactions bottom-up while any level overflows. */
  def compress(st: KllState): Unit = {
    var i = 0
    while (i < st.levels.length) {
      if (st.levels(i).length > st.capacity(i)) {
        if (i + 1 == st.levels.length) {
          st.levels += ArrayBuffer.empty[Double]
          st.flips += 0
        }
        val buf = st.levels(i)
        val sorted = buf.sortInPlace()
        // keep one element behind if odd — weight conservation
        val start = sorted.length % 2
        val off = start + st.flips(i)
        st.flips(i) = 1 - st.flips(i)
        val promoted = ArrayBuffer.empty[Double]
        var j = off
        while (j < sorted.length) { promoted += sorted(j); j += 2 }
        val kept =
          if (start == 1) ArrayBuffer(sorted(0)) else ArrayBuffer.empty[Double]
        st.levels(i) = kept
        st.levels(i + 1) ++= promoted
      }
      i += 1
    }
  }

  /** Merge b into a: concatenate level-wise, then re-compress. */
  def merge(a: KllState, b: KllState): KllState = {
    while (a.levels.length < b.levels.length) {
      a.levels += ArrayBuffer.empty[Double]
      a.flips += 0
    }
    var i = 0
    while (i < b.levels.length) { a.levels(i) ++= b.levels(i); i += 1 }
    a.count += b.count
    compress(a)
    a
  }

  /** Estimate the value at rank fraction q: smallest sketch item whose
    * cumulative weight reaches q·n (weights = 2^level).
    */
  def quantile(st: KllState, q: Double): Double = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < st.levels.length) {
      st.levels(i).foreach(v => items += ((v, 1L << i)))
      i += 1
    }
    if (items.isEmpty) return Double.NaN
    val sorted = items.sortBy(_._1)
    val target = math.max(1L, math.ceil(q * st.count).toLong)
    var cum = 0L
    var j = 0
    while (j < sorted.length) {
      cum += sorted(j)._2
      if (cum >= target) return sorted(j)._1
      j += 1
    }
    sorted.last._1
  }

  def serialize(st: KllState): Array[Byte] = {
    val nItems = st.levels.map(_.length).sum
    val bb = ByteBuffer.allocate(
      4 + 8 + 4 + st.levels.length * 5 + nItems * 8)
    bb.putInt(st.k); bb.putLong(st.count); bb.putInt(st.levels.length)
    st.levels.zip(st.flips).foreach { case (lv, f) =>
      bb.putInt(lv.length)
      bb.put(f.toByte)
      lv.foreach(bb.putDouble)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): KllState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new KllState(bb.getInt)
    st.count = bb.getLong
    val nLevels = bb.getInt
    st.levels.clear()
    st.flips.clear()
    var i = 0
    while (i < nLevels) {
      val n = bb.getInt
      st.flips += bb.get().toInt
      val lv = new ArrayBuffer[Double](n)
      var j = 0
      while (j < n) { lv += bb.getDouble; j += 1 }
      st.levels += lv
      i += 1
    }
    // A malformed buffer encoding nLevels=0 would leave `levels` empty and
    // make the NEXT insert throw IndexOutOfBounds far from the corruption
    // site (this format round-trips through the streaming state store).
    // Re-seed an empty level 0 so corrupt state fails loudly here — or not
    // at all: an empty-but-valid state resumes cleanly.
    if (st.levels.isEmpty) {
      require(st.count == 0L,
        s"KLL deserialize: corrupt buffer — ${st.count} counted items but " +
          "zero levels")
      st.levels += new ArrayBuffer[Double]()
      st.flips += 0
    }
    st
  }
}

/** `graft_kll_quantiles(value, k, array(q...))` → ARRAY<DOUBLE> of
  * estimates, one per requested rank fraction.
  */
case class KllQuantilesAgg(
    child: Expression,
    k: Int,
    qs: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll.KllState] {

  require(k >= 16, s"graft_kll_quantiles: k must be >= 16, got $k")
  require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
    s"graft_kll_quantiles: rank fractions must be in (0, 1], got $qs")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_quantiles requires a DOUBLE value, got " +
        child.dataType.catalogString)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Kll.KllState = new Kll.KllState(k)

  override def update(st: Kll.KllState, input: InternalRow): Kll.KllState = {
    val v = child.eval(input)
    if (v != null) Kll.insert(st, v.asInstanceOf[Double])
    st
  }

  override def merge(a: Kll.KllState, b: Kll.KllState): Kll.KllState =
    Kll.merge(a, b)

  override def eval(st: Kll.KllState): Any =
    new GenericArrayData(qs.map(q => Kll.quantile(st, q)).toArray)

  override def serialize(st: Kll.KllState): Array[Byte] = Kll.serialize(st)
  override def deserialize(b: Array[Byte]): Kll.KllState = Kll.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllQuantilesAgg = copy(child = c(0))

  override def prettyName: String = "graft_kll_quantiles"
}

object KllFunctions {
  def kllQuantiles(value: Column, k: Int, qs: Seq[Double]): Column =
    GraftColumnBridge.column(
      KllQuantilesAgg(GraftColumnBridge.expression(value), k, qs)
        .toAggregateExpression())
}

package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters: a k-counter summary that finds every item
  * occurring more than n/(k+1) times in ONE pass with O(k) state — the
  * frequent-items operator for columns whose exact count-distinct state
  * would not fit anywhere (user ids, URLs, shingles at 100 TB).
  *
  * Guarantees (the classic ones, preserved by the pairwise merge):
  *   - any item with true count > n/(k+1) is present in the output;
  *   - every reported estimate is an UNDER-count by at most n/(k+1):
  *     `true - n/(k+1) <= est <= true`.
  *
  * Aggregation shape: partial sketches are built map-side (each partition
  * scans once, O(k) memory), and only k-entry summaries shuffle — the
  * TypedImperativeAggregate contract, same as [[TopKStructs]]. NOTE the
  * kept-set is merge-order sensitive at the margin (as in every MG
  * implementation); the bound above holds for ANY order, which is why the
  * verification contract asserts the bound, not the set.
  */
case class HeavyHittersSketch(
    itemExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"heavy_hitters requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(itemExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (itemExpr.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters requires a STRING item, got " +
        itemExpr.dataType.catalogString)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = itemExpr.eval(input)
    if (v != null) MisraGries.offer(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long])
  : mutable.HashMap[String, Long] = MisraGries.merge(a, b, k)

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val payload = entries.map { case (s, _) =>
      s.getBytes(StandardCharsets.UTF_8)
    }
    val bb = ByteBuffer.allocate(
      4 + payload.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.zip(payload).foreach { case ((_, c), bytes) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
  : mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      m.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HeavyHittersSketch =
    copy(itemExpr = c(0))

  override def prettyName: String = "graft_heavy_hitters"
}

/** The Misra–Gries counter-map operations, shared by the batch aggregate
  * and the streaming stateful twin. Both guarantees (presence above
  * n/(k+1); under-count ≤ n/(k+1)) are invariants of these two functions
  * alone.
  */
object MisraGries {

  /** Fold one item into a ≤k-entry counter map. */
  def offer(buf: mutable.HashMap[String, Long], item: String, k: Int): Unit =
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1L)
      case None if buf.size < k => buf.update(item, 1L)
      case None => // decrement-all step; drops the incoming item too
        val dead = mutable.ArrayBuffer[String]()
        buf.mapValuesInPlace { (key, c) =>
          if (c == 1L) dead += key; c - 1L
        }
        dead.foreach(buf.remove)
    }

  /** Combine two summaries: add counts, then subtract the (k+1)-th
    * largest from everything and keep > 0 — the merge that preserves the
    * n/(k+1) under-count bound.
    */
  def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long],
            k: Int): mutable.HashMap[String, Long] = {
    b.foreach { case (item, c) =>
      a.update(item, a.getOrElse(item, 0L) + c)
    }
    if (a.size > k) {
      val cut = a.values.toArray.sortInPlace()(Ordering[Long].reverse)(k)
      val dead = mutable.ArrayBuffer[String]()
      a.mapValuesInPlace { (key, c) =>
        if (c <= cut) dead += key; c - cut
      }
      dead.foreach(a.remove)
    }
    a
  }
}

object HeavyHittersFunctions {
  /** Column-API wrapper: `heavyHitters(item, k)` usable inside `.agg`. */
  def heavyHitters(item: Column, k: Int): Column =
    GraftColumnBridge.column(
      HeavyHittersSketch(GraftColumnBridge.expression(item), k)
        .toAggregateExpression())
}

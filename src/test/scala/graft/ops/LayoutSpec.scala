package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference interleave on the driver, bit by bit. */
  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.sum

  test("morton2 matches the bitwise reference on the full 8-bit grid") {
    val grid = for (a <- 0L until 256L by 17L; b <- 0L until 256L by 13L)
      yield (a, b)
    val out = grid.toDF("a", "b")
      .select($"a", $"b", Layout.morton2($"a", $"b", 8).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (a, b, z) => assert(z == mortonRef(a, b, 8), s"($a,$b)") }
  }

  test("morton2 is a bijection on the grid (sortable unique key)") {
    val all = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val zs = all.toDF("a", "b")
      .select(Layout.morton2($"a", $"b", 5).as("z")).as[Long].collect()
    assert(zs.toSet.size == 32 * 32)
    assert(zs.min == 0L && zs.max == (1L << 10) - 1)
  }

  test("z-order locality: a z-range touches a bounded sub-grid, not a full row/column") {
    // rows sorted by z, cut into 64-value blocks: every block must span at
    // most a small range in BOTH dims (here: a 2^k-aligned quad of side 8).
    // A lexicographic (a, b) sort fails this: its "blocks" span the full b
    // range for each a.
    val all = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val blocks = all.toDF("a", "b")
      .select($"a", $"b", Layout.morton2($"a", $"b", 6).as("z"))
      .groupBy((col("z") / 64).cast("long").as("blk"))
      .agg(max($"a") - min($"a") as "spanA", max($"b") - min($"b") as "spanB")
      .as[(Long, Long, Long)].collect()
    assert(blocks.length == 64)
    blocks.foreach { case (blk, spanA, spanB) =>
      assert(spanA <= 7 && spanB <= 7, s"block $blk spans $spanA x $spanB")
    }
  }
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout operators: space-filling-curve sort keys for
  * multi-dimensional data skipping.
  *
  * Sorting a table by ONE column gives perfect min/max pruning on that
  * column and none on any other. Interleaving the bits of several
  * bucketized dimensions (a Morton / Z-order key) and sorting by THAT
  * keeps every dimension locally clustered: each written file covers a
  * small range of every interleaved column, so per-file min/max stats
  * prune scans filtered on ANY of them. This is the layout trick behind
  * Delta/Iceberg `ZORDER BY` — here as a plain column expression, so
  * `df.repartitionByRange(col("z")).sortWithinPartitions("z").write...`
  * produces the skipping-friendly layout with no engine extension.
  *
  * The key is pure integer arithmetic (shift/mask/add) — codegen'd,
  * map-only, identical in any engine with 64-bit integers, which is what
  * makes the layout decision oracle-checkable.
  */
object Layout {

  /** Morton/Z-order interleave of two already-bucketized non-negative
    * dims, `bits` bits each (bucket values must fit: 0 <= v < 2^bits).
    * Bit i of `a` lands at position 2i, bit i of `b` at 2i+1, so the
    * result orders by a recursive quad-tree walk of the (a, b) grid.
    * 2×`bits` must stay under 63 (signed-long safe).
    */
  def morton2(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"morton2 bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }
}

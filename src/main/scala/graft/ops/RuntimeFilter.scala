package graft.ops

import graft.functions.BloomFilterFunctions.bloomAgg
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Explicit runtime-filter join reduction (see
  * [[graft.functions.BloomFilterOps]] for the filter itself and the
  * one-sidedness contract that makes this exact).
  *
  * The 100 TB shape this exists for: `fact ⋉ dim` where dim is
  * millions-of-keys big — too big for a broadcast-hash join, so Spark
  * plans a shuffle join and the ENTIRE fact table crosses the wire just
  * to be discarded on the other side. Building a ~MB bloom over the dim
  * keys and probing it in the fact scan's filter kills non-matching fact
  * rows before the exchange: shuffle volume drops by the join's true
  * selectivity (often 100×) for one extra dim pass that is itself a
  * map-side-partial aggregation. False positives survive the probe but
  * die in the exact join behind it, so results are bit-identical to the
  * plain join for ANY filter size.
  */
object RuntimeFilter {

  /** `fact ⋉ dim` (left-semi) with a bloom prefilter on the fact side.
    *
    * The bloom rides into the fact's Filter as a SCALAR SUBQUERY, not a
    * joined column: Spark executes the one-row aggregate first and treats
    * the result as a constant inside the probe, so the probe is an
    * ordinary deterministic scan-filter that predicate pushdown drives to
    * the bottom of the fact branch — strictly below the join exchange
    * (PlanShapeSpec pins this). The first, crossJoin-based formulation
    * looked equivalent but planned as a join CONDITION, which Catalyst
    * happily reordered ABOVE the semi join — pruning after the wire,
    * i.e. not at all.
    *
    * Plan shape: dim is scanned twice (once aggregated to the scalar
    * bloom, once as the exact join side); fact is scanned once, pruned at
    * the scan, then shuffles only surviving rows. `numBits` sizes the
    * filter: ~10 bits/key ≈ 1% false positives at `numHashes = 5`
    * (wasted shuffle, never wrong results).
    */
  def bloomPrunedSemiJoin(fact: DataFrame, factKey: Column,
                          dim: DataFrame, dimKey: Column,
                          numBits: Long = 1L << 23,
                          numHashes: Int = 5): DataFrame = {
    val bloom = dim.agg(
      bloomAgg(xxhash64(dimKey), numBits, numHashes).as("__graft_bloom"))
    val probe = GraftColumnBridge.column(
      graft.functions.BloomMightContain(
        org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
          bloom.queryExecution.analyzed),
        GraftColumnBridge.expression(xxhash64(factKey))))
    val pruned = fact.where(probe)
    val keys = dim.select(dimKey.as("__graft_dim_key")).distinct()
    pruned.join(keys, factKey === col("__graft_dim_key"), "left_semi")
  }
}

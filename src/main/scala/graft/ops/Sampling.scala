package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling: keep a row iff a stable hash of its
  * key lands under the rate threshold.
  *
  * Unlike `df.sample()` (seeded per-partition RNG — resample on every
  * retry/repartition, engine-specific), hash sampling is a pure function
  * of the KEY: reproducible across runs, engines, and cluster layouts,
  * and consistent across tables (sampling two tables by the same key
  * keeps them joinable — the property training-data pipelines need when
  * carving out held-out shards). md5 is the hash for the same reason the
  * dedup family uses it: both engines compute it identically.
  */
object Sampling {

  /** Keep rows where hash(key) mod `outOf` < `keep` (a keep/outOf
    * fraction, e.g. (1, 10) = 10%).
    */
  def hashSample(df: DataFrame, keyCol: Column, keep: Int, outOf: Int)
  : DataFrame =
    df.filter(hashBucket(keyCol, outOf) < keep)

  /** The stable bucket in [0, outOf): first 8 md5 hex chars of the key's
    * string form, as a number, mod outOf.
    */
  def hashBucket(keyCol: Column, outOf: Int): Column =
    conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10)
      .cast("long") % outOf

  /** Weighted-sampling priority (exponential race): score =
    * -ln(u) / weight with u the key's md5-derived uniform in (0,1). The
    * minimum of Exp(wᵢ) variables lands on item i with probability
    * wᵢ/Σw, so ascending-score top-k IS weighted sampling without
    * replacement (the A-ES ordering) — and, being a pure function of the
    * key, the same k rows come back on every run and engine.
    *
    * Top-k by this score is a TakeOrdered (per-partition heap, k rows to
    * the driver) — no global sort, no shuffle of the data.
    *
    * Precondition w > 0, ENFORCED: weight 0 would score +Inf (never
    * sampled) and a negative weight a negative priority that always wins
    * top-k — both silently wrong samples. Non-positive (or null) weights
    * score null instead, so bad weights surface in the output rather
    * than dominate it; clamp upstream (`greatest(w, lit(1.0))`) if a
    * floor is the intended policy.
    */
  def weightedPriority(keyCol: Column, weight: Column): Column = {
    val u = (conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    when(weight > 0.0, -log(u) / weight)
  }

  /** Per-row weighted keep decision: bucket in [0, 10000) < `keepBps`
    * (basis points, so a policy table can express rates down to 0.01%).
    *
    * This is the mixture-shaping primitive: `keepBps` usually arrives by
    * joining a tiny per-domain policy table (broadcast), the decision
    * itself is map-only, and — because the bucket is a pure function of
    * the key — the SAME rows are kept on every run, engine, and appended
    * re-run. Downsampling a 100 TB corpus to a declared domain mix is one
    * scan, no shuffle.
    */
  def weightedKeep(keyCol: Column, keepBps: Column): Column =
    hashBucket(keyCol, 10000) < keepBps
}

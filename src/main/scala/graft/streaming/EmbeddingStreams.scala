package graft.streaming

import graft.ops.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming embedding dedup — the vector twin of
  * [[DocStreams.dedupByFingerprint]], completing batch/stream parity for
  * the dedup family: text content has a fingerprint stream-dedup and a
  * batch index; embeddings had only the batch path
  * (`embedding_neardup_lsh`) until this.
  *
  * Near-duplicate detection over a stream cannot join all-pairs, so it
  * uses the SAME bucketing the batch LSH pipeline uses:
  * [[Vectors.lshSignature]] (deterministic random-hyperplane SimHash —
  * near-identical embeddings collapse onto one signature), and keeps the
  * FIRST vector per signature bucket. State is one row per distinct
  * signature seen within the watermark horizon and is EVICTED at the
  * horizon, so memory is bounded by (ingest rate × watermark), not
  * stream lifetime — the same contract as the fingerprint dedup, with
  * the same explicit trade: a near-dup arriving after the horizon passes
  * through, and the periodic batch `embedding_neardup_lsh` reconciliation
  * catches it (stream-filters-fast / batch-reconciles-fully).
  *
  * Recall/precision follow the plane count exactly as in the batch op:
  * more planes → smaller buckets → fewer false merges, more misses. The
  * default (8 planes over 64 dims) matches the batch
  * `embedding_neardup_lsh` key, so what the stream drops is what the
  * batch pipeline would have paired — certified by the parity spec.
  */
object EmbeddingStreams {

  /** First vector per LSH bucket wins; same-bucket arrivals within the
    * watermark horizon are dropped. Input: any streaming frame with
    * (`vecCol`: array&lt;float&gt;, `ts`: timestamp). Output keeps the
    * input columns plus the `sig` bucket key (downstream audits group on
    * it). Map-only except the dedup state store — the signature is a
    * plane-count-bounded column expression, no shuffle before the
    * stateful operator.
    */
  def dedupBySignature(vectors: DataFrame,
                       numPlanes: Int = 8, dim: Int = 64,
                       vecCol: String = "embedding",
                       watermark: String = "2 hours"): DataFrame =
    vectors
      .withColumn("sig", Vectors.lshSignature(col(vecCol), numPlanes, dim))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("sig")
}

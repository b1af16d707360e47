package graft.streaming

import graft.ops.TextDedup
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming NEAR-duplicate gate — the live twin of the batch MinHash+LSH
  * dedup family. [[DocStreams.dedupByFingerprint]] catches byte-identical
  * content; this catches the mutated-boilerplate case (template pages,
  * syndicated articles with swapped bylines) the same way the batch
  * `dedup_minhash_lsh` does: shingle → row-local MinHash → LSH band keys,
  * then a band-bucket claim check instead of a pair join.
  *
  * Semantics — SEQUENTIAL-GREEDY keep-first: documents are processed in
  * `seq` order; a document is KEPT iff none of its band buckets was
  * claimed by ANY earlier document, and it claims all its buckets either
  * way (a dropped near-dup still extends its cluster's bucket frontier,
  * which is what makes a chain a → b → c collapse to {a} exactly like the
  * batch connected-components keep-first when the chain is discovered in
  * arrival order). Decisions are final at emit and INVARIANT to
  * micro-batch boundaries: claims depend only on seq order, which the
  * per-bucket fold sorts explicitly — NeardupStreamSpec pins parity with
  * a sequential replay of the same rule at two batch shapes.
  *
  * Plan shape (one streaming query):
  *   - signature: one tight JVM pass per document
  *     ([[TextDedup.minhashSignatureJvm]] via `mapPartitions`) — no
  *     aggregate, no interpreted higher-order functions (the Column
  *     formulation measured 10× slower: ArrayTransform lambdas run
  *     outside whole-stage codegen); docs too short to shingle bypass
  *     the gate as kept (the batch path never pairs them either);
  *   - claim check: ONE stateful operator, `flatMapGroupsWithState` keyed
  *     by band-bucket key. State is one long per bucket (the claimant's
  *     seq) with an event-time timeout at the watermark horizon, so the
  *     store is bounded by (distinct buckets within horizon) — the same
  *     rate × horizon bound as the exact-dedup store, times the band
  *     count;
  *   - verdict: every band row of a document is emitted in the SAME
  *     micro-batch it arrived, so the per-document all-bands fold is
  *     STATELESS — a hash repartition on doc_id and a per-partition
  *     count-up, no second state store, no added watermark latency.
  */
object NeardupStream {

  /** One exploded band row: `bkey` packs the band index and that band's
    * signature slice; `n_bands` rides along so the verdict fold knows
    * when it has seen the document's full band set.
    */
  case class BandRow(bkey: String, doc_id: Long, seq: Long, n_bands: Int,
                     ts: java.sql.Timestamp)

  /** A document's signature at band grain: empty `bands` marks a document
    * too short to shingle (kept by definition).
    */
  case class SigRow(doc_id: Long, seq: Long, ts: java.sql.Timestamp,
                    bands: Seq[String])

  /** Per-band claim verdict emitted by the stateful operator. */
  case class BandVerdict(doc_id: Long, seq: Long, n_bands: Int,
                         claimed: Boolean)

  /** Final per-document decision: kept iff the document claimed every one
    * of its band buckets (`claimed_bands == n_bands`). `n_bands == 0`
    * marks a too-short-to-shingle document, kept by definition.
    */
  case class NeardupDecision(doc_id: Long, seq: Long, kept: Boolean,
                             n_bands: Int, claimed_bands: Int)

  /** Fixed eviction horizon in millis for a watermark delay string. Parsed
    * with Spark's own interval parser so every delay `withWatermark`
    * accepts (including compound strings like "1 hour 30 minutes" and
    * week units) yields the same duration here; calendar-unit months are
    * rejected because they have no fixed millisecond width (Spark's
    * watermark machinery rejects them for the same reason).
    */
  private[streaming] def horizonMillis(watermark: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
    require(iv.months == 0,
      s"watermark delay must not use calendar months: '$watermark'")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** The gate. Input needs (doc_id: long, text: string, seq: long,
    * ts: timestamp); emits one [[NeardupDecision]] per document in the
    * batch it arrived.
    */
  def neardupStream(docs: DataFrame, textCol: String = "text",
                    watermark: String = "2 hours",
                    k: Int = TextDedup.NumHashes,
                    shingleN: Int = 3): Dataset[NeardupDecision] = {
    val horizon = horizonMillis(watermark)
    gate(docs, textCol, watermark, k, shingleN,
      bandRows => claimsViaFlatMapGroups(bandRows, horizon))
  }

  /** The claim stage as `flatMapGroupsWithState`: one long per bucket,
    * EVENT-TIME timeout at the watermark horizon.
    */
  private def claimsViaFlatMapGroups(bandRows: Dataset[BandRow],
                                     horizon: Long): Dataset[BandVerdict] =
    bandRows.groupByKey(_.bkey)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(
        (_: String, batch: Iterator[BandRow],
         state: org.apache.spark.sql.streaming.GroupState[Long]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // seq order decides the claim — batch-boundary and shuffle
            // invariant by construction
            val rows = batch.toSeq.sortBy(r => (r.seq, r.doc_id))
            val already = state.exists
            val out = rows.zipWithIndex.map { case (r, i) =>
              BandVerdict(r.doc_id, r.seq, r.n_bands,
                claimed = !already && i == 0)
            }
            if (!already) state.update(rows.head.seq)
            // extend the eviction horizon past the newest arrival; never
            // set a timeout at or below the current watermark (a late
            // band row would otherwise make the call throw)
            state.setTimeoutTimestamp(
              math.max(rows.map(_.ts.getTime).max,
                state.getCurrentWatermarkMs()) + horizon)
            out.iterator
          }
        })(Encoders.scalaLong, Encoders.product[BandVerdict])

  /** Everything around the claim stage: signature, short-doc bypass,
    * band explode, and the stateless per-doc fold. The claim stage is
    * pluggable so the fMGWS and transformWithState engines share one
    * pipeline (and one spec contract).
    */
  private[streaming] def gate(docs: DataFrame, textCol: String,
                              watermark: String, k: Int, shingleN: Int,
                              claims: Dataset[BandRow] => Dataset[BandVerdict])
  : Dataset[NeardupDecision] = {
    require(k > 0 && k % TextDedup.BandSize == 0,
      s"signature length k=$k must be a positive multiple of the band " +
        s"size ${TextDedup.BandSize}: the band slices below index " +
        "0 until k in full BandSize strides")
    val nBands = k / TextDedup.BandSize
    val bandSize = TextDedup.BandSize
    implicit val decEnc = Encoders.product[NeardupDecision]

    // one tight JVM pass per document: split → shingle → salted-md5 →
    // lane mins → band keys (see TextDedup.minhashSignatureJvm — the
    // Column/HOF formulation runs interpreted and measured 10× slower)
    val sig = docs
      .select(col("doc_id").cast("long"), col("seq").cast("long"),
        col("ts"), col(textCol).cast("string").as("text"))
      .as(Encoders.product[(Long, Long, java.sql.Timestamp, String)])
      .mapPartitions { it =>
        it.map { case (docId, seq, ts, text) =>
          val mh = TextDedup.minhashSignatureJvm(text, k, shingleN)
          val bands =
            if (mh == null) Seq.empty[String]
            else (0 until k by bandSize).map { s =>
              ((s / bandSize).toLong +: (s until s + bandSize).map(mh))
                .mkString("|")
            }
          SigRow(docId, seq, ts, bands)
        }
      }(Encoders.product[SigRow])

    // too short to shingle → kept unconditionally, never enters a bucket
    val short = sig.filter(_.bands.isEmpty)
      .map(r => NeardupDecision(r.doc_id, r.seq, kept = true,
        n_bands = 0, claimed_bands = 0))(decEnc)

    // same (band | mh slice) bucket key as the batch lshCandidatePairs
    val bandRows = sig.filter(_.bands.nonEmpty)
      .flatMap(r => r.bands.map(b =>
        BandRow(b, r.doc_id, r.seq, nBands, r.ts)))(
        Encoders.product[BandRow])
      .withWatermark("ts", watermark)
      .as(Encoders.product[BandRow])

    val verdicts = claims(bandRows)

    // all n_bands verdicts of a doc emit in the SAME batch → the fold is
    // stateless: co-locate by doc_id, count claims per partition slice
    val decided = verdicts.repartition(col("doc_id"))
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap
          .empty[Long, (Long, Int, Int)] // doc -> (seq, n_bands, claimed)
        it.foreach { v =>
          val (s, n, c) = acc.getOrElse(v.doc_id, (v.seq, v.n_bands, 0))
          acc(v.doc_id) = (s, n, c + (if (v.claimed) 1 else 0))
        }
        acc.iterator.map { case (doc, (s, n, c)) =>
          NeardupDecision(doc, s, kept = c == n, n_bands = n,
            claimed_bands = c)
        }
      }(decEnc)

    decided.unionByName(short)
  }
}

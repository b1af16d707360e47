package graft.streaming

import graft.ops.TextDedup
import graft.streaming.DocStreams.{QuotaDecision, QuotaDoc}
import graft.streaming.NeardupStream.{BandRow, BandVerdict, NeardupDecision}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** `transformWithState` twins of the curation gates — the Spark-4 arbitrary
  * stateful API (SPARK-46815) the `flatMapGroupsWithState` originals
  * predate. Why both engines ship:
  *
  *  - fMGWS is the portable baseline: it runs on the default HDFS-backed
  *    state store and its event-time timeout keys eviction to the
  *    WATERMARK, which is what the batch-parity specs reason about.
  *  - transformWithState is the production-scale path: RocksDB-only (the
  *    provider must be `RocksDBStateStoreProvider` — state spills off
  *    heap instead of living in executor memory, which is what a month of
  *    band-claim buckets at crawl rate needs), typed named state with
  *    NATIVE TTL (the store evicts expired values itself — no hand-rolled
  *    timeout bookkeeping to get wrong), and in-place schema evolution.
  *
  * Semantics parity: the quota twin is decision-identical to
  * [[DocStreams.tokenQuotaStream]] by construction (same fold, no
  * eviction in either). The near-dup twin keeps the SAME event-time
  * eviction contract as the fMGWS engine, re-expressed with TWS named
  * timers — see the ClaimProcessor note for why state TTL (the API's
  * processing-time eviction) is NOT usable here: it makes the query
  * unable to quiesce. Both twins are decision-identical to their
  * originals on every batch shape TwsGatesSpec drives.
  *
  * CHANGELOG-CHECKPOINTING POLICY (derived from the measured ×1/×10/×64
  * restart cycles, STREAMBENCH.md r15): enable
  * `spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled`
  * for any long-running TWS gate — it wins the COMMIT path at every
  * measured state size (−14–41% on a 16-commit prime: per-batch commits
  * ship a delta, not a full RocksDB snapshot, and on a real DFS the
  * snapshot upload is the fsync-heavy part). The cost lands at RESTART:
  * restore = snapshot load + replay of every changelog since the last
  * UPLOADED snapshot, and the bound on that tail is TWO knobs, not one —
  * snapshot uploads run in the ASYNC maintenance thread, so
  * `spark.sql.streaming.stateStore.minDeltasForSnapshot` (default 10)
  * only marks a snapshot due, while
  * `spark.sql.streaming.stateStore.maintenanceInterval` (default 60s)
  * decides when the upload actually happens. Measured at ×64 state:
  * default knobs replayed the whole 16-changelog prime (restore 7.4s vs
  * the snapshot variant's 1.5s; minDeltas=4 ALONE changed nothing
  * because a sub-minute prime never hits a maintenance tick);
  * minDeltas=4 + maintenanceInterval=2s bounded restore to 2.9s, paying
  * +40% prime time and ~3× retained checkpoint bytes. So: restarts
  * rare → keep the defaults and bank the commit-path win; restarts
  * frequent or recovery-SLA-bound → set minDeltas ≈ (acceptable extra
  * restore seconds) ÷ (per-changelog replay seconds) AND a maintenance
  * interval shorter than minDeltas × the batch period, and budget the
  * extra snapshot uploads.
  *
  * Measurement caveat (and deployment caveat in miniature): the
  * maintenance task is a JVM-wide singleton that captures its tick
  * period when the FIRST stateful query of the process starts — a
  * maintenanceInterval set after any stateful query ran is a silent
  * no-op for the life of the JVM. [[graft.BenchStream]]'s cadence row
  * therefore refuses to run unless it is the process's first stateful
  * query (`only`-scoped, fresh JVM); set the interval in the session
  * conf BEFORE the first `start()` in production too.
  */
object TwsGates {

  /** Per-source running token total; emits the greedy-prefix verdict per
    * arrival. State: ONE long per source, no TTL (budgets don't expire).
    */
  private class QuotaProcessor(budget: Long)
      extends StatefulProcessor[String, QuotaDoc, QuotaDecision] {
    @transient private var cum: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(source: String, rows: Iterator[QuotaDoc],
                                 tv: TimerValues): Iterator[QuotaDecision] = {
      var c = if (cum.exists()) cum.get() else 0L
      val out = rows.toSeq.sortBy(_.seq).map { d =>
        c += d.n_tokens
        QuotaDecision(source, d.doc_id, d.n_tokens,
          kept = c <= budget, cum_tokens = c)
      }
      cum.update(c)
      out.iterator
    }
  }

  /** Live twin of [[DocStreams.tokenQuotaStream]] on the
    * transformWithState engine.
    */
  def tokenQuotaStreamTws(docs: Dataset[QuotaDoc], budget: Long)
  : Dataset[QuotaDecision] = {
    implicit val decEnc = Encoders.product[QuotaDecision]
    docs.groupByKey(_.source)(Encoders.STRING)
      .transformWithState(new QuotaProcessor(budget), TimeMode.None(),
        OutputMode.Append())
  }

  /** Band-bucket claim with EVENT-TIME timers: state is the claimant's
    * seq plus its registered eviction timer; the timer is re-armed past
    * each batch's newest arrival and [[StatefulProcessor.handleExpiredTimer]]
    * clears the claim when the watermark passes it — the exact eviction
    * contract of the fMGWS engine's event-time timeout, expressed with
    * TWS's named timers.
    *
    * Why NOT state TTL (the API's other eviction device): TTL requires
    * `TimeMode.ProcessingTime`, and in that mode
    * `TransformWithStateExec.shouldRunAnotherBatch` is unconditionally
    * true — the engine schedules micro-batches FOREVER to service the
    * wall clock (measured: 692 offset-log entries from one 7-row
    * addData; `processAllAvailable` and even a `Trigger.AvailableNow`
    * drain never terminate). A gate that cannot quiesce cannot be
    * drained, checkpoint-verified, or run in a shared test harness;
    * event-time timers only fire when the watermark moves, so the query
    * settles like every other stateful op here.
    */
  private class ClaimProcessor[I, O](horizonMs: Long, seqOf: I => Long,
      docOf: I => Long, tsOf: I => java.sql.Timestamp,
      verdict: (I, Boolean) => O)
      extends StatefulProcessor[String, I, O] {
    @transient private var claim: ValueState[Long] = _
    @transient private var timer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      claim = getHandle.getValueState[Long]("claim", Encoders.scalaLong,
        TTLConfig.NONE)
      timer = getHandle.getValueState[Long]("timer", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(bkey: String, batch: Iterator[I],
                                 tv: TimerValues): Iterator[O] = {
      // seq order decides the claim — same contract as the fMGWS engine
      val rows = batch.toSeq.sortBy(r => (seqOf(r), docOf(r)))
      val already = claim.exists()
      val out = rows.zipWithIndex.map { case (r, i) =>
        verdict(r, !already && i == 0)
      }
      if (!already && rows.nonEmpty) claim.update(seqOf(rows.head))
      if (rows.nonEmpty) {
        // re-arm the eviction horizon past the newest arrival (never at
        // or below the current watermark); skip the RocksDB delete+put
        // when the due time is unchanged
        val due = math.max(rows.map(tsOf(_).getTime).max,
          tv.getCurrentWatermarkInMs()) + horizonMs
        if (!timer.exists() || timer.get() != due) {
          if (timer.exists()) getHandle.deleteTimer(timer.get())
          getHandle.registerTimer(due)
          timer.update(due)
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(bkey: String, tv: TimerValues,
                                    info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
    : Iterator[O] = {
      claim.clear(); timer.clear()
      Iterator.empty
    }
  }

  /** The near-dup gate on the transformWithState engine — identical
    * pipeline to [[NeardupStream.neardupStream]] (shared via
    * [[NeardupStream.gate]]); only the claim stage differs (named-timer
    * eviction instead of the fMGWS timeout). Requires the RocksDB state
    * store provider.
    */
  def neardupStreamTws(docs: DataFrame, textCol: String = "text",
                       watermark: String = "2 hours",
                       k: Int = TextDedup.NumHashes,
                       shingleN: Int = 3): Dataset[NeardupDecision] = {
    val horizon = NeardupStream.horizonMillis(watermark)
    implicit val verdictEnc = Encoders.product[BandVerdict]
    NeardupStream.gate(docs, textCol, watermark, k, shingleN,
      bandRows => bandRows.groupByKey(_.bkey)(Encoders.STRING)
        .transformWithState(
          new ClaimProcessor[BandRow, BandVerdict](horizon,
            _.seq, _.doc_id, _.ts,
            (r, c) => BandVerdict(r.doc_id, r.seq, r.n_bands, claimed = c)),
          TimeMode.EventTime(), OutputMode.Append()))
  }

  /** THE full streaming curation prefix on the transformWithState engine
    * — quality → exact dedup → near-dup LSH gate → token quota, with BOTH
    * stateful fMGWS stages of [[DocStreams.curatedNeardupQuota]] replaced
    * by their TWS twins (the payload-carrying [[ClaimProcessor]] with
    * named-timer eviction, and [[QuotaProcessor]]); everything around
    * them is the shared [[DocStreams.curatedNeardupQuotaPipeline]], so
    * the parity contract is identical by construction. Requires the
    * RocksDB state store provider and the same multi-stateful
    * checkCorrectness acknowledgement as the fMGWS original (the only
    * watermark-consuming stage — the exact dedup — sits upstream of both
    * TWS operators, and neither drops late rows).
    */
  def curatedNeardupQuotaTws(docs: DataFrame, budget: Long,
                             textCol: String = "text",
                             watermark: String = "2 hours",
                             allowedLangs: Option[Seq[String]] = None)
  : Dataset[DocStreams.QuotaDecision] = {
    import DocStreams.{CurBandRow, CurBandVerdict}
    val horizon = NeardupStream.horizonMillis(watermark)
    implicit val verdictEnc = Encoders.product[CurBandVerdict]
    DocStreams.curatedNeardupQuotaPipeline(docs, textCol, watermark,
      allowedLangs,
      bandRows => bandRows.groupByKey(_.bkey)(Encoders.STRING)
        .transformWithState(
          new ClaimProcessor[CurBandRow, CurBandVerdict](horizon,
            _.seq, _.doc_id, _.ts,
            (r, c) => CurBandVerdict(r.doc_id, r.seq, r.n_bands,
              claimed = c, r.source, r.n_tokens)),
          TimeMode.EventTime(), OutputMode.Append()),
      qd => tokenQuotaStreamTws(qd, budget))
  }
}

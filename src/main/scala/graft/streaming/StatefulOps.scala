package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over an event stream via
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the escape hatch for
  * stateful semantics the built-in window/session operators can't express.
  *
  * Implemented here: per-user running behavior profile (event counts, value
  * sum, last-seen) that emits an updated snapshot whenever the user's state
  * changes, with a processing-time timeout that expires idle users' state —
  * the state-store-boundedness contract any 100 TB/day stream needs (state
  * size is O(active users in horizon), not O(all users ever)).
  */
object StatefulOps {

  case class UserEvent(user_id: Long, event_type: String, value: Double,
                       ts_micros: Long, event_id: Long = 0L)

  case class UserProfile(user_id: Long, n_events: Long, n_purchases: Long,
                         sum_value: Double, last_seen_micros: Long)

  /** Per-user funnel progress: epoch-micros each step was first reached
    * (-1 = not yet) with the reaching event's id (the tie-break), plus
    * the derived depth. The state is MONOTONE — a reached step never
    * unreaches — which is what makes it safe to carry across
    * micro-batches forever (and makes late events conservative: an
    * out-of-order step can miss a conversion, never invent one).
    */
  case class FunnelProgress(user_id: Long, step_us: Seq[Long],
                            step_id: Seq[Long], depth: Int)

  /** Fold a (within-batch, row-order-sorted) event iterator into funnel
    * progress. Shared by the streaming operator and its batch-parity
    * spec, with the SAME row order as [[graft.ops.Behavior.funnel]]:
    * events sort by (ts_micros, event_id), and step i qualifies iff a
    * qualified step i-1 event is strictly earlier in THAT order — so two
    * events sharing a timestamp resolve by event_id in both engines
    * (the r6-advice equal-timestamp divergence), which is why the state
    * carries each step's (ts, event_id) pair, not the timestamp alone.
    */
  private[streaming] def foldFunnel(userId: Long, steps: Seq[String],
                                    events: Iterator[UserEvent],
                                    prior: Option[FunnelProgress])
  : FunnelProgress = {
    val us = prior.map(_.step_us.toArray)
      .getOrElse(Array.fill(steps.size)(-1L))
    val ids = prior.map(_.step_id.toArray)
      .getOrElse(Array.fill(steps.size)(0L))
    events.toSeq.sortBy(e => (e.ts_micros, e.event_id)).foreach { e =>
      val i = steps.indexOf(e.event_type)
      // strictly earlier in (ts, event_id) row order — the batch rule
      def earlier(j: Int): Boolean = us(j) >= 0 &&
        (us(j) < e.ts_micros ||
          (us(j) == e.ts_micros && ids(j) < e.event_id))
      if (i >= 0 && us(i) < 0 && (i == 0 || earlier(i - 1))) {
        us(i) = e.ts_micros; ids(i) = e.event_id
      }
    }
    FunnelProgress(userId, us.toSeq, ids.toSeq, us.count(_ >= 0))
  }

  /** Streaming ordered funnel: the stateful twin of
    * [[graft.ops.Behavior.funnel]]. State per user is a fixed-size array
    * of step timestamps — O(steps), the smallest possible funnel state.
    * Emits the refreshed progress for each user touched in the
    * micro-batch. Ordering contract: event-time order is respected
    * WITHIN a batch (sorted here) and ACROSS batches only as the source
    * delivers it — the streaming answer converges to the batch answer
    * when per-user delivery is in order (the Kafka-partition-by-user
    * deployment), and undercounts otherwise; the batch operator is the
    * reconciliation pass, same split as DocStreams.
    */
  def funnelProgress(events: Dataset[UserEvent], steps: Seq[String])
  : Dataset[FunnelProgress] = {
    implicit val enc = Encoders.product[FunnelProgress]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[UserEvent],
         state: GroupState[FunnelProgress]) => {
          val next = foldFunnel(userId, steps, batch, state.getOption)
          state.update(next)
          Iterator.single(next)
        })
  }

  /** Per-group continuous heavy hitters: the streaming twin of the
    * `graft_heavy_hitters` batch aggregate, carrying the SAME Misra–Gries
    * counter map ([[graft.functions.MisraGries]]) as keyed state — O(k)
    * per group forever, the bounded-state contract a 100 TB/day stream
    * needs for "top items per key so far". The n/(k+1) presence and
    * under-count guarantees hold over the whole stream because state
    * update IS the batch fold.
    */
  case class GroupHeavyHitters(group: String, items: Seq[String],
                               ests: Seq[Long])

  def heavyHittersStream(events: Dataset[(String, String)], k: Int)
  : Dataset[GroupHeavyHitters] = {
    implicit val enc = Encoders.product[GroupHeavyHitters]
    events
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout)(
        (group: String, batch: Iterator[(String, String)],
         state: GroupState[GroupHeavyHitters]) => {
          val buf = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach(s =>
            s.items.zip(s.ests).foreach { case (i, e) => buf.update(i, e) })
          batch.foreach { case (_, item) =>
            graft.functions.MisraGries.offer(buf, item, k)
          }
          val sorted = buf.toSeq.sortBy { case (i, e) => (-e, i) }
          val next = GroupHeavyHitters(group, sorted.map(_._1),
            sorted.map(_._2))
          state.update(next)
          Iterator.single(next)
        })
  }

  /** Event for gap sessionization: `ts` (TimestampType) carries the
    * watermark, `ts_micros` the exact arithmetic (micros, the engine-wide
    * time unit — no ms truncation drift against the batch operator).
    */
  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
                          ts_micros: Long, value: Double, event_id: Long)

  /** The open-session state: O(1) per active user — the boundedness that
    * lets the state store survive any stream length; idle users expire
    * via event-time timeout, not processing time, so reprocessing old
    * data behaves identically to live runs.
    */
  case class OpenSession(user_id: Long, start_us: Long, end_us: Long,
                         n: Long, sum_value: Double)

  /** A closed session, keyed by (user, start) — no ordinal: a session
    * number would have to survive state expiry to stay consistent, which
    * contradicts bounded state. The batch twin's `session_no` is
    * recoverable downstream by ranking starts per user.
    */
  case class ClosedSession(user_id: Long, session_start_us: Long,
                           session_end_us: Long, n_events: Long,
                           sum_value: Double)

  /** Fold a micro-batch into gap sessions: returns the sessions CLOSED by
    * this batch plus the still-open one. Within-batch order is (ts,
    * event_id) like every engine operator. Events older than the open
    * session's own gap window (late past the watermark) fold into their
    * own LATE sub-session for the batch — late events within one gap of
    * each other coalesce instead of fragmenting into per-event
    * singletons — which closes at batch end (only one open session may
    * persist as state). Conservative contract: late data can still
    * FRAGMENT sessions relative to the batch operator (at batch
    * boundaries, and when events straddle the late threshold — the
    * threshold is fixed against the open session's current start, so an
    * in-gap pair can land on opposite sides of it); it never corrupts or
    * resurrects a closed session.
    */
  private[streaming] def foldSessions(uid: Long, gapMicros: Long,
                                      events: Iterator[SessionEvent],
                                      prior: Option[OpenSession])
  : (Seq[ClosedSession], Option[OpenSession]) = {
    def close(s: OpenSession) =
      ClosedSession(uid, s.start_us, s.end_us, s.n, s.sum_value)
    val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
    var open = prior
    var lateOpen: Option[OpenSession] = None
    events.toSeq.sortBy(e => (e.ts_micros, e.event_id)).foreach { e =>
      open match {
        case None =>
          open = Some(OpenSession(uid, e.ts_micros, e.ts_micros, 1L, e.value))
        case Some(s) if e.ts_micros > s.end_us + gapMicros =>
          closed += close(s)
          open = Some(OpenSession(uid, e.ts_micros, e.ts_micros, 1L, e.value))
        case Some(s) if e.ts_micros < s.start_us - gapMicros =>
          // ascending order ⇒ a late event can only extend the late
          // sub-session's end, never precede it
          lateOpen match {
            case Some(ls) if e.ts_micros <= ls.end_us + gapMicros =>
              lateOpen = Some(ls.copy(end_us = e.ts_micros,
                n = ls.n + 1, sum_value = ls.sum_value + e.value))
            case other =>
              other.foreach(ls => closed += close(ls))
              lateOpen = Some(
                OpenSession(uid, e.ts_micros, e.ts_micros, 1L, e.value))
          }
        case Some(s) =>
          open = Some(s.copy(
            start_us = math.min(s.start_us, e.ts_micros),
            end_us = math.max(s.end_us, e.ts_micros),
            n = s.n + 1, sum_value = s.sum_value + e.value))
      }
    }
    lateOpen.foreach(ls => closed += close(ls))
    (closed.toSeq, open)
  }

  /** Streaming gap sessionization — the stateful twin of
    * [[graft.ops.Sessionize]]: sessions close when the EVENT-TIME
    * watermark passes their end plus the gap (never wall-clock, so
    * replays are deterministic), emitted append-only exactly once. A
    * micro-batch can also close a session directly when a same-user
    * event lands past the gap. State is one [[OpenSession]] per active
    * user; the timeout removes it at close, so the store holds only
    * users inside their gap horizon — the bounded-state contract at
    * 100 TB/day.
    */
  def sessionizeStream(events: Dataset[SessionEvent], gapMicros: Long,
                       watermarkDelay: String): Dataset[ClosedSession] = {
    implicit val enc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[OpenSession]
    val gapMs = gapMicros / 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .as(Encoders.product[SessionEvent])
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, batch: Iterator[SessionEvent],
         state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              ClosedSession(uid, s.start_us, s.end_us, s.n, s.sum_value))
          } else {
            val (closed, open) = foldSessions(uid, gapMicros, batch,
              state.getOption)
            open match {
              case Some(s) =>
                state.update(s)
                // timeout must sit strictly past the current watermark
                state.setTimeoutTimestamp(math.max(
                  s.end_us / 1000L + gapMs,
                  state.getCurrentWatermarkMs() + 1L))
              case None => state.remove()
            }
            closed.iterator
          }
        })
  }

  /** Continuous per-group quantiles: the streaming twin of
    * `graft_kll_quantiles` — the SAME [[graft.functions.Kll]] ladder rides
    * as keyed state (serialized form, so state-store encoding is the
    * aggregate's own wire format), folded per micro-batch, O(k·log n) per
    * group forever. Emits refreshed estimates for groups touched in the
    * batch; the rank-envelope guarantee holds over the whole stream
    * because the state update IS the batch fold — the same twin
    * relationship as [[heavyHittersStream]] / `graft_heavy_hitters`.
    */
  case class GroupQuantiles(group: String, n: Long, est: Seq[Double])

  def kllQuantilesStream(values: Dataset[(String, Double)], k: Int,
                         qs: Seq[Double]): Dataset[GroupQuantiles] = {
    implicit val enc = Encoders.product[GroupQuantiles]
    implicit val stateEnc = Encoders.BINARY
    values
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout)(
        (group: String, batch: Iterator[(String, Double)],
         state: GroupState[Array[Byte]]) => {
          val st = state.getOption.map(graft.functions.Kll.deserialize)
            .getOrElse(new graft.functions.Kll.KllState(k))
          batch.foreach { case (_, v) => graft.functions.Kll.insert(st, v) }
          state.update(graft.functions.Kll.serialize(st))
          Iterator.single(GroupQuantiles(group, st.count,
            qs.map(graft.functions.Kll.quantile(st, _))))
        })
  }

  /** Fold a batch of events into the carried state. */
  private[streaming] def fold(userId: Long, events: Iterator[UserEvent],
                              prior: Option[UserProfile]): UserProfile =
    events.foldLeft(prior.getOrElse(UserProfile(userId, 0L, 0L, 0.0, 0L))) {
      (p, e) =>
        UserProfile(
          userId,
          p.n_events + 1,
          p.n_purchases + (if (e.event_type == "purchase") 1 else 0),
          p.sum_value + e.value,
          math.max(p.last_seen_micros, e.ts_micros))
    }

  /** Streaming per-user profiles. Emits the refreshed profile for each
    * updated user per micro-batch.
    *
    * `idleTimeoutMs = Some(ms)` expires state for users idle past the
    * duration (processing time) — the production setting that bounds the
    * state store. Beware: with a processing-time timeout the engine keeps
    * scheduling timeout-evaluation micro-batches, so
    * `processAllAvailable()` never drains — drive such queries with a
    * real trigger, not the test-style drain (observed as a hard hang).
    */
  def userProfiles(events: Dataset[UserEvent],
                   idleTimeoutMs: Option[Long] = None)
  : Dataset[UserProfile] = {
    implicit val profileEnc = Encoders.product[UserProfile]
    val timeoutConf = if (idleTimeoutMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update(), timeoutConf)(
        (userId: Long, batch: Iterator[UserEvent],
         state: GroupState[UserProfile]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val updated = fold(userId, batch, state.getOption)
            state.update(updated)
            idleTimeoutMs.foreach(state.setTimeoutDuration)
            Iterator.single(updated)
          }
        })
  }
}

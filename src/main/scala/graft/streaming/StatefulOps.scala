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

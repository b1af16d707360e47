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
                       ts_micros: Long)

  case class UserProfile(user_id: Long, n_events: Long, n_purchases: Long,
                         sum_value: Double, last_seen_micros: Long)

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

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operators (the `flatMapGroupsWithState` tier of
  * SURVEY §2.9 — what `session_window` can't express: per-key business
  * state machines with explicit timeouts).
  *
  * State is bounded: one [[UserFunnel]] per active user, dropped on
  * event-time timeout. Both operators also run in batch mode (Spark
  * executes the same function per group), which the specs use for a
  * deterministic semantic check against the streaming run.
  */
object StatefulStreams {

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)

  /** Per-user funnel progress: how far through view→cart→purchase the
    * user got, with the cumulative purchase value.
    */
  final case class UserFunnel(user_id: Long, n_events: Long,
      reached_purchase: Boolean, purchase_value: Double)

  def toUserEvents(events: DataFrame): Dataset[UserEvent] = {
    implicit val enc = Encoders.product[UserEvent]
    events.select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[UserEvent]
  }

  /** Funnel tracking with explicit state + event-time timeout. Emits the
    * final funnel row for a user when their state times out (no events
    * past the watermark horizon), or on every update in batch mode.
    */
  def trackFunnels(events: Dataset[UserEvent],
      inactivityTimeoutMin: Long = 30): Dataset[UserFunnel] = {
    implicit val funnelEnc = Encoders.product[UserFunnel]

    def update(userId: Long, evts: Iterator[UserEvent],
        state: GroupState[UserFunnel]): Iterator[UserFunnel] = {
      if (state.hasTimedOut) {
        val out = state.get
        state.remove()
        Iterator(out)
      } else {
        val prev = state.getOption.getOrElse(UserFunnel(userId, 0L, false, 0.0))
        var maxTsMs = Long.MinValue
        val next = evts.foldLeft(prev) { (acc, e) =>
          maxTsMs = math.max(maxTsMs, e.ts.getTime)
          UserFunnel(userId, acc.n_events + 1,
            acc.reached_purchase || e.event_type == "purchase",
            acc.purchase_value + (if (e.event_type == "purchase") e.value else 0.0))
        }
        state.update(next)
        // keep state hot past the watermark for the inactivity horizon; a
        // user silent longer than that gets flushed and restarts. Base the
        // horizon on max(watermark, this batch's event time): on the FIRST
        // micro-batch the watermark is still epoch-zero, and anchoring to
        // it would expire every state immediately at the next batch.
        try state.setTimeoutTimestamp(
          math.max(state.getCurrentWatermarkMs(), maxTsMs)
            + inactivityTimeoutMin * 60 * 1000)
        catch { case _: UnsupportedOperationException => () } // batch mode
        Iterator(next)
      }
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Watermarked stream-stream interval join: purchases joined to the
    * signups of the same user within the preceding hour (attribution
    * join). State on both sides is bounded by the watermark + interval.
    */
  def purchaseAttribution(events: DataFrame): DataFrame =
    attributionJoin(events, "inner")

  /** LEFT OUTER interval join: every purchase emits exactly once —
    * matched purchases with their in-window signup(s) as they arrive,
    * UNMATCHED purchases with null attribution once the watermark
    * proves no in-window signup can still arrive (Spark holds the row
    * in state until `watermark > p_ts + interval`, then emits the null
    * side — so in a live stream the null rows trail by watermark delay
    * + window, and at stream END rows past the final watermark stay
    * unemitted until later input advances it; StatefulStreamsSpec
    * drives the watermark with far-future sentinels to pin
    * stream ≡ batch). State on both sides stays watermark-bounded —
    * the funnel-completeness join ("which purchases had NO preceding
    * signup") at any scale.
    */
  def purchaseAttributionLeftOuter(events: DataFrame): DataFrame =
    attributionJoin(events, "left_outer")

  private def attributionJoin(events: DataFrame, joinType: String): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(signups,
      col("p_user") === col("s_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"),
      joinType)
      .select(col("p_user").as("user_id"), col("s_ts").as("signup_ts"),
        col("p_ts").as("purchase_ts"), col("value"))
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `q_funnel` (queries.AnalyticsQueries): per-user
  * ordered-funnel progression view -> click -> purchase, advanced
  * incrementally with O(1) state per user.
  *
  * Semantics: greedy earliest-chain matching — stage s+1 completes at the
  * first qualifying event with `ts` strictly after the stage-s timestamp.
  * Processing events in event-time order makes greedy matching identical
  * to the batch min-ts chaining (an earlier stage-s time can only ADMIT
  * more stage-s+1 candidates, never exclude one), so the streaming final
  * state equals the batch answer on the same data —
  * `FunnelStreamSpec` pins that across micro-batch boundaries.
  *
  * Scale shape: state is 3 optional timestamps + a stage byte per user
  * (constant, never a buffered event list); the stream shuffles once on
  * user_id, exactly like the batch query's aggregations.
  */
object FunnelStream {

  val Steps: Seq[String] = Seq("view", "click", "purchase")

  final case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)

  final case class FunnelState(
      stage: Int,
      t_view: Option[Timestamp],
      t_click: Option[Timestamp],
      t_purchase: Option[Timestamp])

  /** Emitted whenever a user's stage advances (possibly multiple stages
    * per batch — one row per transition).
    */
  final case class FunnelUpdate(
      user_id: Long,
      funnel_stage: Int,
      stage_ts: Timestamp)

  val emptyState: FunnelState = FunnelState(0, None, None, None)

  /** Advance the per-user state machine by one event; returns the new
    * state and the transition (if any).
    */
  def step(st: FunnelState, e: FunnelEvent): (FunnelState, Option[FunnelUpdate]) =
    st.stage match {
      case 0 if e.event_type == Steps(0) =>
        val next = st.copy(stage = 1, t_view = Some(e.ts))
        (next, Some(FunnelUpdate(e.user_id, 1, e.ts)))
      case 1 if e.event_type == Steps(1) && st.t_view.exists(e.ts.after) =>
        val next = st.copy(stage = 2, t_click = Some(e.ts))
        (next, Some(FunnelUpdate(e.user_id, 2, e.ts)))
      case 2 if e.event_type == Steps(2) && st.t_click.exists(e.ts.after) =>
        val next = st.copy(stage = 3, t_purchase = Some(e.ts))
        (next, Some(FunnelUpdate(e.user_id, 3, e.ts)))
      case _ => (st, None)
    }

  private def advanceGroup(
      userId: Long,
      rows: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelUpdate] = {
    // deterministic within-batch order (event time); cross-batch order is
    // the source's responsibility, as in StreamingIndicators
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
    var st = state.getOption.getOrElse(emptyState)
    val out = Seq.newBuilder[FunnelUpdate]
    sorted.foreach { e =>
      val (next, upd) = step(st, e)
      st = next
      upd.foreach(out += _)
    }
    state.update(st)
    out.result().iterator
  }

  /** Event stream -> stage-transition stream (append mode). */
  def funnelStream(events: Dataset[FunnelEvent]): Dataset[FunnelUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(advanceGroup)
  }
}

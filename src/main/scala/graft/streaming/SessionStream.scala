package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of `q_sessions` (queries.DataPrepQueries): gap-based
  * user sessionization, expressed with Structured Streaming's native
  * `session_window` aggregation rather than custom state — the built-in
  * merges overlapping per-event windows in the state store and emits a
  * session once the watermark passes its close, which is exactly the
  * batch gaps-and-islands semantics (same-session iff the gap to the
  * previous event is <= the gap duration; `SessionStreamSpec` pins the
  * equivalence row-for-row on the driver's events, including the
  * boundary case).
  *
  * Output schema matches the batch query minus `session_seq` (a per-user
  * ordinal over ALL sessions — inherently retrospective; streamed
  * sessions are keyed by (user_id, session_start) instead, which is what
  * a downstream join wants anyway).
  *
  * Scale shape: one shuffle on user_id (same as the batch window's
  * partition key); state per user is the set of OPEN sessions only —
  * bounded by activity within one gap+watermark horizon, not history.
  * The fixed-point `sum_value` makes emitted rows bit-identical to the
  * batch aggregation at any parallelism.
  */
object SessionStream {

  final case class SessionEvent(
      event_id: Long, user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Gap-based sessions over a streaming (event_id, user_id, ts, value)
    * frame. Emits one row per CLOSED session (append mode downstream).
    */
  def sessions(
      events: DataFrame,
      gapUs: Long = 1800000000L,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapUs microseconds"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (sum(floor(col("value") * lit(1e6)).cast("long")).cast("double") /
          lit(1e6)).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Timer-driven sessionization — the same gap semantics as
  * [[SessionStream]] (and batch `q_sessions`), but built on
  * `transformWithState`'s EVENT-TIME TIMERS instead of the
  * `session_window` built-in: the processor keeps one open session per
  * user and registers a timer at close-time (last event + gap); when
  * the watermark passes it with no newer activity, the timer FIRES and
  * the session emits from `handleExpiredTimer`. This is the one
  * Structured Streaming facility the other twins don't exercise —
  * the push-based "tell me when the key went quiet" path every
  * timeout/SLA/abandoned-cart workload needs, where `session_window`
  * only covers the aggregation shape.
  *
  * In-batch gap jumps close sessions inline (same fold as the batch
  * gaps-and-islands); only the LAST open session per key waits on its
  * timer. State: one (start, end, n, Σvalue-fp, expiry) record per
  * user — O(1), plus exactly one registered timer per active key.
  * `TimerSessionSpec` pins row-identity with batch q_sessions on an
  * in-order replay (the shared replay contract).
  */
object TimerSession {

  final case class Ev(
      event_id: Long, user_id: Long, ts: java.sql.Timestamp, value: Double)

  final case class SessionRow(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Open-session state: bounds in epoch micros, count, 1e6-fp sum,
    * and the currently registered timer's expiry (ms).
    */
  final case class Open(
      startUs: Long, endUs: Long, n: Long, sumFp: Long, expiryMs: Long)

  private def us(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def tsOf(u: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
    t
  }

  class TimerProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Ev, SessionRow] {
    @transient private var st: ValueState[Open] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Open](
        "open",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Open](),
        TTLConfig.NONE)

    private def close(key: Long, o: Open): SessionRow =
      SessionRow(key, tsOf(o.startUs), tsOf(o.endUs), o.n,
        o.sumFp.toDouble / 1e6)

    override def handleInputRows(
        key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[SessionRow] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
      var open = if (st.exists()) Some(st.get()) else None
      rows.toSeq
        .sortBy(e =>
          (Math.floorDiv(e.ts.getTime, 1000L), e.ts.getNanos, e.event_id))
        .foreach { e =>
          val t = us(e.ts)
          val fp = math.floor(e.value * 1e6).toLong
          open = open match {
            case Some(o) if t - o.endUs <= gapUs =>
              Some(o.copy(endUs = math.max(o.endUs, t), n = o.n + 1,
                sumFp = o.sumFp + fp))
            case Some(o) =>
              out += close(key, o) // in-batch gap jump: close inline
              Some(Open(t, t, 1L, fp, 0L))
            case None =>
              Some(Open(t, t, 1L, fp, 0L))
          }
        }
      open.foreach { o =>
        // one live timer per key: re-arm at the new close time
        if (st.exists() && st.get().expiryMs > 0
            && st.get().expiryMs != (o.endUs + gapUs + 999) / 1000)
          getHandle.deleteTimer(st.get().expiryMs)
        val expiry = (o.endUs + gapUs + 999) / 1000 // ceil-ms: never early
        getHandle.registerTimer(expiry)
        st.update(o.copy(expiryMs = expiry))
      }
      out.iterator
    }

    override def handleExpiredTimer(
        key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionRow] =
      if (st.exists()) {
        val o = st.get()
        // only the CURRENT timer closes the session (a stale timer for
        // an already-extended session re-arms nothing and emits nothing)
        if (o.expiryMs == expiredTimerInfo.getExpiryTimeInMs) {
          st.clear()
          Iterator.single(close(key, o))
        } else Iterator.empty
      } else Iterator.empty
  }

  /** Closed-session stream over (event_id, user_id, ts, value) rows —
    * requires a watermark on `ts` upstream and the RocksDB state store.
    */
  def sessions(events: Dataset[Ev], gapUs: Long = 1800000000L,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(
        new TimerProcessor(gapUs), TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }
}

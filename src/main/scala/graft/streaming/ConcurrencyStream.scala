package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of q_concurrency's sweep-line: a live open-interval
  * gauge. Input rows are the same ±1 boundary deltas the batch query
  * derives (interval start -> +1 on its day, interval end -> -1), keyed
  * by the group (priority); the processor NETS deltas per day and rolls
  * the running open count forward exactly like the batch running-sum
  * window, so the emitted per-day gauge rows match the batch `run`
  * frame row-for-row on an in-order replay (the parity spec pins this
  * across micro-batch boundaries).
  *
  * Emission contract: day D's gauge emits when the first LATER-day
  * boundary for that key arrives (the event-time-watermark analogue —
  * a day is closed by evidence that time moved past it, not by
  * wall-clock). Callers wanting a final flush append one sentinel
  * boundary with `delta = 0` at a day beyond the data (the sentinel day
  * itself never emits).
  *
  * Scale shape: state is (current day, day accumulator, running count)
  * per key — O(1), independent of history and of interval length; rows
  * fold in day order inside each batch, matching the batch operator
  * whenever delivery is day-ordered per key (the shared replay
  * contract). Days travel as ISO-8601 strings, whose lexicographic
  * order IS day order.
  */
object ConcurrencyStream {

  /** One interval boundary: +1 (open) or -1 (close) on `day`
    * (ISO-8601); 0 is legal (sentinel / no-op).
    */
  final case class Delta(prio: String, day: String, delta: Long)

  /** End-of-day open-interval count for a closed day. */
  final case class Gauge(prio: String, day: String, open_now: Long)

  /** (day being accumulated, its net so far, running count BEFORE that
    * day) — the whole per-key state.
    */
  final case class GState(
      curDay: String, acc: Long, running: Long, started: Boolean)

  class GaugeProcessor extends StatefulProcessor[String, Delta, Gauge] {
    @transient private var st: ValueState[GState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[GState](
        "gauge",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[GState](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[Delta],
        timerValues: TimerValues): Iterator[Gauge] = {
      var s = if (st.exists()) st.get()
      else GState("", 0L, 0L, started = false)
      val out = scala.collection.mutable.ArrayBuffer.empty[Gauge]
      rows.toSeq.sortBy(_.day).foreach { r =>
        if (!s.started) s = GState(r.day, r.delta, 0L, started = true)
        else if (r.day == s.curDay) s = s.copy(acc = s.acc + r.delta)
        else {
          val closed = s.running + s.acc // end-of-day value of curDay
          out += Gauge(key, s.curDay, closed)
          s = GState(r.day, r.delta, closed, started = true)
        }
      }
      st.update(s)
      out.iterator
    }
  }

  /** Per-day gauge stream over `deltas`, keyed by prio. Requires the
    * RocksDB state store provider (transformWithState).
    */
  def gauge(deltas: Dataset[Delta]): Dataset[Gauge] = {
    val spark = deltas.sparkSession
    import spark.implicits._
    deltas
      .groupByKey(_.prio)
      .transformWithState(
        new GaugeProcessor, TimeMode.None(), OutputMode.Append())
  }
}

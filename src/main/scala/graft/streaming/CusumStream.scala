package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of [[graft.ops.CusumAlarm]]: the identical integer
  * CUSUM alarm recurrence carried as O(1) per-symbol state across
  * micro-batches — the live process-monitoring face of q_cusum_alarm
  * (same quantization, same max(0, ...) clamps and reset-on-alarm, so
  * the stream is bit-exact with the batch fold on an in-order replay;
  * the parity spec pins this across batch boundaries).
  *
  * Scale shape: state is three int64s + a flag per series, independent
  * of history (the [[StreamingIndicators]] discipline); rows fold in
  * (ts, event_id) order inside each batch, matching the batch operator
  * whenever delivery is in event order per key (the shared replay
  * contract).
  */
object CusumStream {

  final case class Tick(
      symbol: String, ts: Timestamp, event_id: Long, value: Double)

  final case class Alarmed(
      symbol: String, event_id: Long, p_fp: Long, su_fp: Long, sl_fp: Long,
      alarm: Boolean)

  /** (reference level, upper stat, lower stat, initialized) — the whole
    * per-series state.
    */
  final case class CState(ref: Long, su: Long, sl: Long, started: Boolean)

  class CusumProcessor(kappa: Long, h: Long)
      extends StatefulProcessor[String, Tick, Alarmed] {
    @transient private var st: ValueState[CState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CState](
        "cusum",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CState](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[Tick],
        timerValues: TimerValues): Iterator[Alarmed] = {
      var s = if (st.exists()) st.get() else CState(0L, 0L, 0L, started = false)
      val out = scala.collection.mutable.ArrayBuffer.empty[Alarmed]
      // (seconds, nanos, event_id) batch-internal order — getTime alone
      // is ms-truncated (the NOTES.md MemoryStream µs gotcha)
      rows.toSeq
        .sortBy(t =>
          (Math.floorDiv(t.ts.getTime, 1000L), t.ts.getNanos, t.event_id))
        .foreach { t =>
          val p = math.floor(t.value * 1e2 + 0.5).toLong
          if (!s.started) {
            s = CState(p, 0L, 0L, started = true)
            out += Alarmed(key, t.event_id, p, 0L, 0L, alarm = false)
          } else {
            val suE = math.max(0L, s.su + (p - s.ref - kappa))
            val slE = math.max(0L, s.sl + (s.ref - p - kappa))
            val alarm = suE > h || slE > h
            s = CState(s.ref, if (alarm) 0L else suE, if (alarm) 0L else slE,
              started = true)
            out += Alarmed(key, t.event_id, p, suE, slE, alarm)
          }
        }
      st.update(s)
      out.iterator
    }
  }

  /** Alarmed stream over `ticks`, keyed by symbol. Requires the RocksDB
    * state store provider (transformWithState).
    */
  def alarmed(
      ticks: Dataset[Tick], kappa: Long = 2000L, h: Long = 10000L)
      : Dataset[Alarmed] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.symbol)
      .transformWithState(
        new CusumProcessor(kappa, h), TimeMode.None(), OutputMode.Append())
  }
}

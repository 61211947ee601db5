package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of [[graft.ops.Holt]]: the identical integer Holt
  * level+trend recurrence carried as O(1) per-symbol state across
  * micro-batches — the live forecaster face of `q_holt` (same
  * fixed-point quantization, same truncate-toward-zero updates, so the
  * stream is bit-exact with the batch fold on an in-order replay; the
  * parity spec pins this across batch boundaries).
  *
  * Scale shape: state is two int64s + a flag per series, independent of
  * history (the [[StreamingIndicators]] discipline); rows are folded in
  * (ts, event_id) order inside each batch, so replays and backfills
  * agree with the batch operator whenever delivery is in event order
  * per key (the replay contract every stateful op here shares).
  */
object HoltStream {

  final case class Tick(
      symbol: String, ts: Timestamp, event_id: Long, value: Double)

  final case class Smoothed(
      symbol: String, event_id: Long, p_fp: Long, l_fp: Long, b_fp: Long,
      forecast_fp: Long)

  /** (level, trend, initialized) — the whole per-series state. */
  final case class HState(l: Long, b: Long, started: Boolean)

  class HoltProcessor extends StatefulProcessor[String, Tick, Smoothed] {
    @transient private var st: ValueState[HState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[HState](
        "holt",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[HState](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[Tick],
        timerValues: TimerValues): Iterator[Smoothed] = {
      var s = if (st.exists()) st.get() else HState(0L, 0L, started = false)
      val out = scala.collection.mutable.ArrayBuffer.empty[Smoothed]
      // batch-internal event order: same (ts, event_id) key as the batch
      // fold — (seconds, nanos) rather than getTime alone, which is
      // ms-truncated and would collapse sub-ms ties (the NOTES.md
      // MemoryStream µs gotcha)
      rows.toSeq
        .sortBy(t =>
          (Math.floorDiv(t.ts.getTime, 1000L), t.ts.getNanos, t.event_id))
        .foreach { t =>
        val p = math.floor(t.value * 1e2 + 0.5).toLong
        s = if (!s.started) HState(p, 0L, started = true)
        else {
          val lnew = (2 * p + 8 * (s.l + s.b)) / 10
          HState(lnew, ((lnew - s.l) + 9 * s.b) / 10, started = true)
        }
        out += Smoothed(key, t.event_id, p, s.l, s.b, s.l + s.b)
      }
      st.update(s)
      out.iterator
    }
  }

  /** Smoothed stream over `ticks`, keyed by symbol. Requires the
    * RocksDB state store provider (transformWithState).
    */
  def smoothed(ticks: Dataset[Tick]): Dataset[Smoothed] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.symbol)
      .transformWithState(
        new HoltProcessor, TimeMode.None(), OutputMode.Append())
  }
}

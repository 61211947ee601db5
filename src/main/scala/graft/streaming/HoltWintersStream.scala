package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of [[graft.ops.HoltWinters]]: the identical integer
  * level+trend+seasonal recurrence carried as O(m) per-series state
  * across micro-batches — the live seasonal forecaster face of
  * `q_holt_winters` (same fixed-point quantization and slot arithmetic,
  * so the stream is bit-exact with the batch fold on an in-order hourly
  * replay; the parity spec pins this across batch boundaries).
  *
  * Input rows are CLOSED hourly buckets (symbol, hb, p) — the upstream
  * hourly rollup is the q_rollup/session-window territory; this stage
  * owns only the recurrence, exactly like [[HoltStream]] owns Holt's.
  * State: two int64s, a row counter, and the m-slot seasonal array —
  * constant per series, independent of history.
  */
object HoltWintersStream {

  final case class HourRow(symbol: String, hb: Long, p: Long)

  final case class Smoothed(
      symbol: String, hb: Long, p_fp: Long, l_fp: Long, b_fp: Long,
      s_fp: Long, forecast_fp: Long)

  /** Whole per-series state: level, trend, rows seen, seasonal slots. */
  final case class HwState(l: Long, b: Long, t: Long, s: Array[Long])

  class HwProcessor(m: Int) extends StatefulProcessor[String, HourRow, Smoothed] {
    @transient private var st: ValueState[HwState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[HwState](
        "hw",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[HwState](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[HourRow],
        timerValues: TimerValues): Iterator[Smoothed] = {
      var state = if (st.exists()) st.get()
        else HwState(0L, 0L, 0L, Array.fill(m)(0L))
      var l = state.l
      var b = state.b
      var t = state.t
      val s = state.s.clone()
      val out = scala.collection.mutable.ArrayBuffer.empty[Smoothed]
      rows.toSeq.sortBy(_.hb).foreach { r =>
        t += 1
        val idx = ((t - 1) % m).toInt
        if (t == 1) { l = r.p; b = 0L }
        else {
          val lprev = l
          l = (2 * (r.p - s(idx)) + 8 * (l + b)) / 10
          b = ((l - lprev) + 9 * b) / 10
        }
        s(idx) = ((r.p - l) + 3 * s(idx)) / 4
        out += Smoothed(key, r.hb, r.p, l, b, s(idx),
          l + b + s((t % m).toInt))
      }
      st.update(HwState(l, b, t, s))
      out.iterator
    }
  }

  /** Smoothed stream over closed hourly buckets, keyed by symbol.
    * Requires the RocksDB state store provider (transformWithState).
    */
  def smoothed(hours: Dataset[HourRow],
      m: Int = graft.ops.HoltWinters.Period): Dataset[Smoothed] = {
    val spark = hours.sparkSession
    import spark.implicits._
    hours
      .groupByKey(_.symbol)
      .transformWithState(
        new HwProcessor(m), TimeMode.None(), OutputMode.Append())
  }
}

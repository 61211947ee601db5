package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of [[graft.ops.Croston]]: the identical
  * intermittent-demand recurrence carried as O(1) per-series state
  * across micro-batches — the live reorder-point forecaster face of
  * `q_croston`. State is three int64s + a counter per series (size z,
  * interval p, previous demand period, event index), independent of
  * history; same alpha = 1/4 integer fixed point and truncating
  * division, so the stream is bit-exact with the batch fold on an
  * in-order replay (the parity spec pins this across batch splits).
  *
  * Input contract (same as the batch op): one row per (series, period)
  * with positive integer demand — upstream owns the per-period rollup;
  * the recurrence is this stage's only job (the HoltWintersStream
  * division of labor). Delivery must be in period order per key, the
  * replay contract every stateful op here shares.
  */
object CrostonStream {

  final case class Demand(series: Long, dd: Long, q: Long)

  final case class Forecast(
      series: Long, rn: Long, q: Long, gap_d: Long, z_fp: Long, p_fp: Long,
      f_fp: Long)

  /** (z, p, previous period, events seen) — the whole per-series state. */
  final case class CState(z: Long, p: Long, prev: Long, rn: Long)

  private val S = graft.ops.Croston.S

  class CrostonProcessor extends StatefulProcessor[Long, Demand, Forecast] {
    @transient private var st: ValueState[CState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CState](
        "croston",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CState](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: Long, rows: Iterator[Demand],
        timerValues: TimerValues): Iterator[Forecast] = {
      var s = if (st.exists()) st.get() else CState(0L, 0L, 0L, 0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[Forecast]
      rows.toSeq.sortBy(_.dd).foreach { e =>
        val rn = s.rn + 1
        val gap = if (rn == 1) 1L else e.dd - s.prev
        // loud contract failure instead of silent state corruption: a
        // demand for an already-folded period arriving in a LATER
        // micro-batch would drive p toward zero and poison f_fp
        require(rn == 1 || gap > 0,
          s"CrostonStream: out-of-order delivery for series $key — " +
            s"period ${e.dd} arrived after ${s.prev} was folded " +
            "(delivery must be in period order per key)")
        s = if (rn == 1) CState(e.q * S, gap * S, e.dd, rn)
        else CState(
          (e.q * S + 3 * s.z) / 4, (gap * S + 3 * s.p) / 4, e.dd, rn)
        out += Forecast(key, rn, e.q, gap, s.z, s.p, s.z * 1000000L / s.p)
      }
      st.update(s)
      out.iterator
    }
  }

  /** Croston forecasts over `demand`, keyed by series. Requires the
    * RocksDB state store provider (transformWithState).
    */
  def forecasts(demand: Dataset[Demand]): Dataset[Forecast] = {
    val spark = demand.sparkSession
    import spark.implicits._
    demand
      .groupByKey(_.series)
      .transformWithState(
        new CrostonProcessor, TimeMode.None(), OutputMode.Append())
  }
}

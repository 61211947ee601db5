package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.ops.Kalman.{Q, R, S}

/** Streaming twin of [[graft.ops.Kalman]]: the identical integer
  * time-varying-gain recurrence carried as O(1) per-symbol state across
  * micro-batches (the [[HoltStream]] discipline) — the live face of
  * `q_kalman`, bit-exact with the batch fold on an in-order replay
  * INCLUDING the gain annealing sequence (state carries the posterior
  * variance, so a restart mid-burn-in resumes the same gain schedule).
  */
object KalmanStream {

  final case class Tick(
      symbol: String, ts: Timestamp, event_id: Long, value: Double)

  final case class Filtered(
      symbol: String, event_id: Long, p_fp: Long, x_fp: Long,
      pvar_fp: Long, k_fp: Long)

  /** (estimate, posterior variance, initialized). */
  final case class KState(x: Long, pv: Long, started: Boolean)

  class KalmanProcessor extends StatefulProcessor[String, Tick, Filtered] {
    @transient private var st: ValueState[KState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[KState](
        "kalman",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KState](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[Tick],
        timerValues: TimerValues): Iterator[Filtered] = {
      var s = if (st.exists()) st.get() else KState(0L, 0L, started = false)
      val out = scala.collection.mutable.ArrayBuffer.empty[Filtered]
      rows.toSeq
        .sortBy(t =>
          (Math.floorDiv(t.ts.getTime, 1000L), t.ts.getNanos, t.event_id))
        .foreach { t =>
          val p = math.floor(t.value * 1e2 + 0.5).toLong
          var k = 0L
          s = if (!s.started) KState(p, R, started = true)
          else {
            val pp = s.pv + Q
            k = (pp * S) / (pp + R)
            KState(s.x + (k * (p - s.x)) / S, ((S - k) * pp) / S,
              started = true)
          }
          out += Filtered(key, t.event_id, p, s.x, s.pv, k)
        }
      st.update(s)
      out.iterator
    }
  }

  /** Filtered stream over `ticks`, keyed by symbol. Requires the
    * RocksDB state store provider (transformWithState).
    */
  def filtered(ticks: Dataset[Tick]): Dataset[Filtered] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.symbol)
      .transformWithState(
        new KalmanProcessor, TimeMode.None(), OutputMode.Append())
  }
}

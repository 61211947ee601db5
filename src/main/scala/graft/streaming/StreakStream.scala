package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of `q_streak` (gaps-and-islands up-tick runs): the
  * current / longest strict up-tick streak per symbol carried as O(1)
  * state across micro-batches — live momentum persistence next to the
  * batch audit. Identical run semantics: a run extends only on a
  * STRICT value increase over the previous tick; ties and the first
  * tick break runs; `n_streaks_ge3` counts each island once, the
  * moment its length reaches 3 (the batch `len >= 3` island count).
  *
  * Scale shape: state is (last value, three int64 counters, flag) per
  * series, independent of history (the [[StreamingIndicators]]
  * discipline); rows fold in (seconds, nanos, event_id) order inside
  * each batch, so in-order replays are row-identical to the batch
  * operator (the shared replay contract; the parity spec pins the
  * final per-symbol (max, ge3) pair against `q_streak`).
  */
object StreakStream {

  final case class Tick(
      symbol: String, ts: Timestamp, event_id: Long, value: Double)

  final case class Streaks(
      symbol: String, event_id: Long, cur_streak: Long, max_streak: Long,
      n_streaks_ge3: Long)

  /** (previous value, current run, longest run, islands >= 3, init). */
  final case class SState(
      last: Double, cur: Long, mx: Long, ge3: Long, started: Boolean)

  class StreakProcessor extends StatefulProcessor[String, Tick, Streaks] {
    @transient private var st: ValueState[SState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SState](
        "streak",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[SState](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[Tick],
        timerValues: TimerValues): Iterator[Streaks] = {
      var s = if (st.exists()) st.get()
        else SState(0.0, 0L, 0L, 0L, started = false)
      val out = scala.collection.mutable.ArrayBuffer.empty[Streaks]
      rows.toSeq
        .sortBy(t =>
          (Math.floorDiv(t.ts.getTime, 1000L), t.ts.getNanos, t.event_id))
        .foreach { t =>
          val cur = if (s.started && t.value > s.last) s.cur + 1 else 0L
          val ge3 = if (cur == 3L) s.ge3 + 1 else s.ge3
          s = SState(t.value, cur, math.max(s.mx, cur), ge3, started = true)
          out += Streaks(key, t.event_id, s.cur, s.mx, s.ge3)
        }
      st.update(s)
      out.iterator
    }
  }

  /** Running streak stream over `ticks`, keyed by symbol. Requires the
    * RocksDB state store provider (transformWithState).
    */
  def streaks(ticks: Dataset[Tick]): Dataset[Streaks] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.symbol)
      .transformWithState(
        new StreakProcessor, TimeMode.None(), OutputMode.Append())
  }
}

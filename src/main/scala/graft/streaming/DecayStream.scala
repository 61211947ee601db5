package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import graft.ops.Decay

/** Streaming exponentially-decayed activity score — the live twin of
  * the batch [[graft.ops.Decay]] ranking signal: per key, a
  * DAY-GRANULAR raw-sum map (native MapState — day-range-bounded,
  * independent of row count) is folded each micro-batch, and the score
  * is re-weighted against the key's latest active day on emit.
  *
  * Bit-exactness contract (pinned by `DecayStreamSpec`): after any
  * stream prefix, a touched key's emitted row equals
  * `Decay.decayedSum` over the same rows with `days_ago` measured from
  * the key's own last-active day — exactly, because the batch op
  * quantizes once per (key, day) group and the state map holds those
  * very day groups raw (weights are applied only at emission, so a new
  * max day re-weights history with no accumulated rounding).
  *
  * Reference-day semantics, stated: the score decays against the KEY's
  * last-active day (a keyed processor cannot see a global max), and
  * `last_day` is emitted so a reader can rescale any two keys onto a
  * common "now" with one further quantized multiply α^(now − last_day).
  * State is O(active day range)/key; for unbounded horizons, expire
  * days older than the weight table's zero point (α^k scale-floors to
  * 0 at k ≈ 450 for α = 0.97) — their contribution is exactly zero.
  */
object DecayStream {

  val Num = 97L
  val Den = 100L
  val Scale = 1000000L

  final case class Ev(key: String, day: Long, v: Long)

  final case class Score(
      key: String, n_events: Long, raw_sum: Long, last_day: Long,
      decayed_fp: Long)

  class DecayProcessor extends StatefulProcessor[String, Ev, Score] {
    // day -> (n, raw sum): point updates per touched day only
    @transient private var st: MapState[Long, (Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[Long, (Long, Long)](
        "days",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long](),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Score] = {
      var delta = Map.empty[Long, (Long, Long)]
      rows.foreach { e =>
        val (n, s) = delta.getOrElse(e.day, (0L, 0L))
        delta = delta.updated(e.day, (n + 1L, s + e.v))
      }
      if (delta.isEmpty) Iterator.empty
      else {
        delta.foreach { case (d, (n, s)) =>
          val (pn, ps) =
            if (st.containsKey(d)) st.getValue(d) else (0L, 0L)
          st.updateValue(d, (pn + n, ps + s))
        }
        val days = st.iterator().map(p => p._1 -> p._2).toMap
        val last = days.keysIterator.max
        Iterator.single(Score(
          key,
          days.valuesIterator.map(_._1).sum,
          days.valuesIterator.map(_._2).sum,
          last,
          Decay.decayedOf(
            days.map { case (d, (_, s)) => d -> s }, last,
            Num, Den, Scale)))
      }
    }
  }

  /** One score row per touched key per micro-batch. Requires the
    * RocksDB state store provider (transformWithState).
    */
  def scores(evs: Dataset[Ev]): Dataset[Score] = {
    val spark = evs.sparkSession
    import spark.implicits._
    evs.groupByKey(_.key)
      .transformWithState(
        new DecayProcessor, TimeMode.None(), OutputMode.Append())
  }
}

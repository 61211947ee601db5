package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of [[graft.ops.HmmForward]]: the identical integer
  * forward-filter recurrence carried as O(1) per-key state across
  * micro-batches — live regime probabilities per event. This is the
  * operator the batch doc PROMISES is streamable (the forward pass,
  * unlike Viterbi's backtrack, depends only on (a0, a1) and the new
  * row); the parity spec pins stream ≡ batch bit-for-bit across batch
  * boundaries.
  *
  * State per key: the (a0, rn) pair — a1 is always scale − a0, so one
  * int64 plus the running sequence position. Rows fold in
  * (seconds, nanos, event_id) order inside each batch (the
  * [[HoltStream]] replay contract: in-order delivery per key).
  */
object HmmStream {

  final case class Obs(
      user_id: Long, ts: Timestamp, event_id: Long, we0: Long, we1: Long)

  final case class Posterior(
      user_id: Long, rn: Long, event_id: Long, p1_fp: Long)

  /** (a0, rn) — the whole per-key state; rn = 0 means uninitialized. */
  final case class FState(a0: Long, rn: Long)

  class ForwardProcessor(pStay: Long, scale: Long)
      extends StatefulProcessor[Long, Obs, Posterior] {
    @transient private var st: ValueState[FState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FState](
        "hmm_fwd",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[FState](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: Long, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[Posterior] = {
      val pSwitch = scale - pStay
      var s = if (st.exists()) st.get() else FState(0L, 0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[Posterior]
      rows.toSeq
        .sortBy(o =>
          (Math.floorDiv(o.ts.getTime, 1000L), o.ts.getNanos, o.event_id))
        .foreach { o =>
          val (u0, u1) =
            if (s.rn == 0L) (o.we0, o.we1)
            else {
              val a1 = scale - s.a0
              val prior0 = (s.a0 * pStay + a1 * pSwitch) / scale
              val prior1 = (s.a0 * pSwitch + a1 * pStay) / scale
              (o.we0 * prior0, o.we1 * prior1)
            }
          s = FState(u0 * scale / (u0 + u1), s.rn + 1)
          out += Posterior(key, s.rn, o.event_id, scale - s.a0)
        }
      st.update(s)
      out.iterator
    }
  }

  /** Posterior stream over `obs`, keyed by user. Requires the RocksDB
    * state store provider (transformWithState).
    */
  def posteriors(obs: Dataset[Obs], pStay: Long = 800000L,
      scale: Long = 1000000L): Dataset[Posterior] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .groupByKey(_.user_id)
      .transformWithState(
        new ForwardProcessor(pStay, scale), TimeMode.None(), OutputMode.Append())
  }
}

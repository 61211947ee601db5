package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.unsafe.types.UTF8String

/** Streaming twin of [[graft.ops.BanditReplay]]: the per-user
  * epsilon-greedy replay state (arm pulls/rewards + position counter)
  * carried across micro-batches — the LIVE policy evaluator face of
  * `q_bandit_replay` (a dashboard watching "how would this policy have
  * done" as the log streams in).
  *
  * The exploration schedule hashes (user, position), so the position
  * counter rides in state and the stream is bit-exact with the batch
  * replay on an in-order per-key delivery (the replay contract every
  * stateful twin shares). All-integer state transitions — the same
  * reason the batch op rejected UCB's libm bonus.
  *
  * Scale shape: O(#arms) ints per user; one shuffle per batch on the
  * user key.
  */
object BanditStream {

  final case class Ev(
      user_id: Long, ts: Timestamp, event_id: Long, event_type: String,
      value: Double)

  final case class ArmStat(user_id: Long, arm: String, pulls: Long,
      rewards: Long)

  final case class BState(t: Long, n: Array[Long], s: Array[Long])

  private val S = 1000000L

  class BanditProcessor extends StatefulProcessor[Long, Ev, ArmStat] {
    private val arms = graft.ops.BanditReplay.Arms
    @transient private var st: ValueState[BState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[BState](
        "bandit",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[BState](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[ArmStat] = {
      val k = arms.length
      val cur = if (st.exists()) st.get()
        else BState(0L, Array.fill(k)(0L), Array.fill(k)(0L))
      var t = cur.t
      val n = cur.n.clone()
      val s = cur.s.clone()
      rows.toSeq
        .sortBy(e =>
          (Math.floorDiv(e.ts.getTime, 1000L), e.ts.getNanos, e.event_id))
        .foreach { e =>
          t += 1
          val arm = arms.indexOf(e.event_type)
          val ex = graft.functions.Md5Prefix60.hash60(
            UTF8String.fromString(s"$key:$t"))
          val sel =
            if (ex % 8 == 0) ((ex / 8) % k).toInt
            else {
              var best = 0
              var bv = Long.MinValue
              var i = 0
              while (i < k) {
                val v = if (n(i) == 0) 2 * S else s(i) * S / n(i)
                if (v > bv) { bv = v; best = i }
                i += 1
              }
              best
            }
          if (sel == arm) {
            n(sel) += 1
            s(sel) += (if (e.value >= 260.0) 1L else 0L)
          }
        }
      st.update(BState(t, n, s))
      (0 until k).iterator.map(i => ArmStat(key, arms(i), n(i), s(i)))
    }
  }

  /** Live per-user scorecard stream: #arms refreshed rows per touched
    * user per micro-batch. Requires the RocksDB state store provider.
    */
  def scorecards(events: Dataset[Ev]): Dataset[ArmStat] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new BanditProcessor, TimeMode.None(), OutputMode.Append())
  }
}

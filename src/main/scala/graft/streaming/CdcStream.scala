package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming CDC apply — the live twin of batch `q_cdc_apply`
  * (last-writer-wins with delete tombstones): every change record folds
  * into O(1) keyed state holding the current winner by (ts, event_id)
  * sequence, and each micro-batch emits the post-batch resolved row for
  * every key it touched (`deleted = true` when a tombstone currently
  * wins — the downstream MERGE's delete signal).
  *
  * Ordering contract: the winner is by SEQUENCE, not arrival — late or
  * re-delivered records with a lower (ts, event_id) never overwrite a
  * newer state, so the fold is idempotent under replay and bit-exact
  * with the batch argmax regardless of batch boundaries (the parity
  * spec shuffles deliveries across uneven batches).
  */
object CdcStream {

  final case class Change(
      user_id: Long, op: String, ts: Timestamp, event_id: Long, value: Double)

  final case class Resolved(
      user_id: Long, last_ts: Timestamp, event_id: Long, last_value: Double,
      deleted: Boolean)

  /** (sequence, op, value) of the current winner. */
  final case class CState(
      tsMillis: Long, tsNanos: Int, event_id: Long, op: String, value: Double)

  class ApplyProcessor extends StatefulProcessor[Long, Change, Resolved] {
    @transient private var st: ValueState[CState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CState](
        "cdc",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CState](),
        TTLConfig.NONE)
    // the FULL batch-argmax tuple, not just the sequence: exact
    // duplicate sequences (a malformed log, but possible) must resolve
    // to the same winner as max(struct(ts, event_id, op, value)) —
    // Scala String ordering matches the UTF8 binary compare for these
    // single-letter ops, Double ordering matches for non-NaN values
    private def ord(s: CState): (Long, Int, Long, String, Double) =
      (s.tsMillis, s.tsNanos, s.event_id, s.op, s.value)
    override def handleInputRows(
        key: Long, rows: Iterator[Change],
        timerValues: TimerValues): Iterator[Resolved] = {
      var cur = if (st.exists()) Option(st.get()) else None
      rows.foreach { c =>
        val cand = CState(c.ts.getTime, c.ts.getNanos, c.event_id, c.op, c.value)
        if (cur.forall(s =>
          Ordering[(Long, Int, Long, String, Double)].lt(ord(s), ord(cand))))
          cur = Some(cand)
      }
      cur.foreach(st.update)
      cur.iterator.map { s =>
        val ts = new Timestamp(s.tsMillis)
        ts.setNanos(s.tsNanos)
        // event_id rides along so a snapshot reader can break last_ts
        // ties deterministically (two winners CAN share last_ts across
        // emissions when a same-ts higher-event_id record supersedes)
        Resolved(key, ts, s.event_id, s.value, deleted = s.op == "D")
      }
    }
  }

  /** Resolved-row stream over `changes`, keyed by user_id. Requires the
    * RocksDB state store provider (transformWithState).
    */
  def applied(changes: Dataset[Change]): Dataset[Resolved] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.user_id)
      .transformWithState(
        new ApplyProcessor, TimeMode.None(), OutputMode.Append())
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming subsequence similarity alerts: every arriving point closes
  * a trailing window of its series, which is scored against a small
  * pattern bank; windows within `threshold` squared-Euclidean distance
  * of a pattern emit an alert. The streaming face of `q_pattern_match`
  * (same fixed-index-order distance fold).
  *
  * Scale shape: state is ONE ring of `w` doubles per series — O(w) per
  * key, independent of history (the same per-key-ring discipline as the
  * indicator pipeline); the pattern bank is task-local (serialized with
  * the processor — patterns are KBs, the stream is the big side), so
  * scoring is row-local with no join or shuffle beyond the keying.
  */
object PatternAlerts {

  final case class Point(series: String, ts: Timestamp, value: Double)

  final case class Alert(
      series: String, ts: Timestamp, pattern_id: Long, dist: Double)

  /** Ring state: the last up-to-w values of the series, oldest first. */
  class RingProcessor(
      patterns: Seq[(Long, Array[Double])], threshold: Double, w: Int)
      extends StatefulProcessor[String, Point, Alert] {
    @transient private var ring: ValueState[Array[Double]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getValueState[Array[Double]](
        "ring",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[Point],
        timerValues: TimerValues): Iterator[Alert] = {
      var buf = if (ring.exists()) ring.get() else Array.empty[Double]
      val out = scala.collection.mutable.ArrayBuffer.empty[Alert]
      rows.toSeq.sortBy(p => (p.ts.getTime, p.value)).foreach { p =>
        buf = (if (buf.length >= w) buf.drop(buf.length - w + 1) else buf) :+ p.value
        if (buf.length == w) {
          patterns.foreach { case (pid, pat) =>
            var d = 0.0
            var i = 0
            while (i < w) {
              val x = buf(i) - pat(i); d += x * x; i += 1
            }
            if (d <= threshold) out += Alert(key, p.ts, pid, d)
          }
        }
      }
      ring.update(buf)
      out.iterator
    }
  }

  /** Alert stream over `points`, keyed by series. Requires the RocksDB
    * state store provider (transformWithState).
    */
  def alerts(
      points: Dataset[Point],
      patterns: Seq[(Long, Array[Double])],
      threshold: Double,
      w: Int = 8): Dataset[Alert] = {
    require(patterns.forall(_._2.length == w), "pattern length must equal w")
    val spark = points.sparkSession
    import spark.implicits._
    points
      .groupByKey(_.series)
      .transformWithState(
        new RingProcessor(patterns, threshold, w),
        TimeMode.None(), OutputMode.Append())
  }
}

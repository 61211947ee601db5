package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming fixed-bin histogram with live EXACT (bin-granular)
  * quantiles per symbol — the always-on profiling face of the batch
  * quantile trio: per-key integer bin counts (bin = floor(value),
  * clamped to [0, MaxBin]) are monotone mergeable state, so after any
  * prefix of the stream the p50/p90 read off the bin CDF is exactly
  * the batch order statistic at bin granularity over the same rows
  * (the parity spec pins this). Unlike a sketch there is NO error
  * term — the trade is bin resolution, not accuracy.
  *
  * Scale shape: state is VALUE-RANGE-bounded (≤ MaxBin+1 longs per
  * key — the q_decile_bucket grid convention carried to streaming),
  * independent of row count; each batch folds row-locally and emits
  * one summary row per touched key.
  */
object HistogramStream {

  /** Bins cover [0, MaxBin]; values outside clamp to the edges (the
    * caller rescales first if its domain differs).
    */
  val MaxBin = 4095

  final case class Tick(
      symbol: String, ts: Timestamp, event_id: Long, value: Double)

  final case class HistSummary(
      symbol: String, n_total: Long, n_bins: Long, p50_bin: Long,
      p90_bin: Long)

  private[streaming] def binOf(v: Double): Int =
    math.min(MaxBin, math.max(0, math.floor(v).toInt))

  /** Smallest bin whose cumulative count reaches rank `r` (1-based). */
  private[streaming] def binAtRank(bins: Map[Int, Long], r: Long): Long = {
    var cum = 0L
    bins.toSeq.sortBy(_._1).foreach { case (b, c) =>
      cum += c
      if (cum >= r) return b.toLong
    }
    -1L
  }

  class HistProcessor extends StatefulProcessor[String, Tick, HistSummary] {
    // bin -> count as NATIVE MapState: per-bin point updates in the
    // store (no whole-map rewrite per batch; ValueState cannot encode
    // MapType at all — found loudly by the spec)
    @transient private var st: MapState[Int, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[Int, Long](
        "hist",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Int](),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[Tick],
        timerValues: TimerValues): Iterator[HistSummary] = {
      // fold the batch locally, then write only the touched bins
      var delta = Map.empty[Int, Long]
      rows.foreach { t =>
        val b = binOf(t.value)
        delta = delta.updated(b, delta.getOrElse(b, 0L) + 1L)
      }
      if (delta.isEmpty) Iterator.empty
      else {
        delta.foreach { case (b, c) =>
          st.updateValue(b,
            (if (st.containsKey(b)) st.getValue(b) else 0L) + c)
        }
        val bins = st.iterator().map(p => p._1 -> p._2).toMap
        val n = bins.valuesIterator.sum
        Iterator.single(HistSummary(
          key, n, bins.size.toLong,
          binAtRank(bins, (n + 1) / 2),
          binAtRank(bins, (9 * n + 9) / 10)))
      }
    }
  }

  /** One summary row per touched symbol per micro-batch. Requires the
    * RocksDB state store provider (transformWithState).
    */
  def summaries(ticks: Dataset[Tick]): Dataset[HistSummary] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.symbol)
      .transformWithState(
        new HistProcessor, TimeMode.None(), OutputMode.Append())
  }
}

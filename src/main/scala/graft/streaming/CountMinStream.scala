package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming twin of [[graft.ops.CountMin]]: the d x w sketch maintained
  * incrementally over a document stream. Hash-row keyed state (d keys,
  * each holding its w bucket counters — O(d*w) total, independent of
  * vocabulary and stream length), exact bucket-wise increments, full
  * per-row snapshot emitted each batch so a downstream consumer always
  * joins the freshest sketch. The merge algebra that makes this correct
  * (bucket-wise sum across batches == one-shot sketch) is pinned by
  * `CountMinSpec`; `CountMinStreamSpec` pins the streamed state against
  * the one-shot batch sketch across micro-batch boundaries.
  *
  * Requires the RocksDB state store provider (transformWithState), like
  * [[TokenTrends]].
  */
object CountMinStream {

  final case class HashRow(i: Int, bucket: Long)

  /** Snapshot row of hash row `i` after `n_row` tokens: bucket count. */
  final case class CmEntry(i: Int, n_row: Long, bucket: Long, cnt: Long)

  class CmProcessor(w: Int)
      extends StatefulProcessor[Int, HashRow, CmEntry] {
    // state = (tokens seen, dense w-wide counter array): the state-store
    // encoder supports arrays but not long-keyed maps, and a CM row is
    // dense by construction anyway (fixed width, zero-heavy early only)
    @transient private var st: ValueState[(Long, Array[Long])] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Array[Long])](
        "cm", ExpressionEncoder[(Long, Array[Long])](),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        key: Int, rows: Iterator[HashRow],
        timerValues: TimerValues): Iterator[CmEntry] = {
      var (n, arr) =
        if (st.exists()) st.get() else (0L, Array.fill(w)(0L))
      rows.foreach { r => arr(r.bucket.toInt) += 1L; n += 1 }
      st.update((n, arr))
      val nn = n
      arr.iterator.zipWithIndex.collect {
        case (c, bk) if c > 0 => CmEntry(key, nn, bk.toLong, c)
      }
    }
  }

  /** Maintain the streaming sketch over document text (whitespace
    * tokens, the [[graft.ops.CountMin]] hash family).
    */
  def sketchStream(
      docs: Dataset[DocStream.DocEvent],
      d: Int = 4, w: Int = 256): Dataset[CmEntry] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF()
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(explode(sequence(lit(0), lit(d - 1))).as("i"), col("tok"))
      .select(col("i"),
        expr(s"md5p60(concat(cast(i as string), ':', tok)) % $w").as("bucket"))
      .as[HashRow]
      .groupByKey(_.i)
      .transformWithState(
        new CmProcessor(w), TimeMode.None(), OutputMode.Append())
  }
}

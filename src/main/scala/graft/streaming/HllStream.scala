package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of [[graft.ops.Hll]]: the per-key 256-register
  * HyperLogLog array carried as keyed state, refreshed estimate emitted
  * after every micro-batch — the live distinct-count face of `q_hll`.
  * Registers merge by element-wise max, so the stream state after any
  * replay equals the batch sketch of the same rows REGARDLESS of
  * delivery order or duplication — the strongest parity contract in the
  * streaming tier (no in-order requirement at all; HllStreamSpec pins
  * shuffled + duplicated delivery).
  *
  * The estimate math is single-sourced: the processor emits the same
  * (key, zeros, zr) register aggregates the batch path folds, and
  * [[graft.ops.Hll.finish]] applies the identical alpha/linear-counting
  * chain to the streaming frame (row-local expressions only).
  *
  * Scale shape: state is exactly 256 bytes per key; each micro-batch
  * shuffles its rows once on the key and touches only the keys present
  * in the batch.
  */
object HllStream {

  final case class Obs(key: String, h: Long)

  /** Register aggregate row per (key, batch) — feed to [[graft.ops.Hll.finish]]. */
  final case class RegAgg(key: String, zeros: Long, zr: Long)

  final case class Regs(mj: Array[Byte])

  /** rho = leading zeros of the 52-bit witness + 1 — the Scala twin of
    * [[graft.ops.Hll.rhoCase]]'s integer comparison ladder.
    */
  def rho(w: Long): Int =
    if (w <= 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))

  class HllProcessor extends StatefulProcessor[String, Obs, RegAgg] {
    @transient private var st: ValueState[Regs] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Regs](
        "hll",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Regs](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[RegAgg] = {
      val mj = if (st.exists()) st.get().mj.clone()
        else Array.fill[Byte](graft.ops.Hll.m)(0)
      rows.foreach { o =>
        val j = (o.h % graft.ops.Hll.m).toInt
        val r = rho(o.h / 256)
        if (r > mj(j)) mj(j) = r.toByte
      }
      st.update(Regs(mj))
      var zeros = 0L
      var zr = 0L
      var i = 0
      while (i < mj.length) {
        if (mj(i) == 0) zeros += 1 else zr += 1L << (53 - mj(i))
        i += 1
      }
      Iterator.single(RegAgg(key, zeros, zr))
    }
  }

  /** Estimate stream over (key, h) observations: one refreshed
    * (key, zeros, hll_fp) row per touched key per micro-batch.
    */
  def estimates(obs: Dataset[Obs]): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    graft.ops.Hll.finish(
      obs.groupByKey(_.key)
        .transformWithState(
          new HllProcessor, TimeMode.None(), OutputMode.Append())
        .toDF())
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.ops.Kmv

/** Streaming twin of the `q_kmv` distinct sketch: the per-key K-minimum
  * -values array carried as keyed state, refreshed (sk_size, kth_h,
  * est) emitted after every micro-batch — the live distinct-count face
  * of the KMV tier, next to [[HllStream]] (HLL trades exactness of the
  * sketch itself for fixed 256-byte state; KMV's state is ≤ K longs
  * AND its sketch is value-exact, so the parity contract is equality
  * with the BATCH sketch of the same rows).
  *
  * Merge is "K smallest distinct of the union" — a lattice join, so
  * the state after any replay is independent of delivery order and
  * duplication (KmvStreamSpec pins shuffled + duplicated delivery).
  * The estimate expression is single-sourced from [[Kmv.estExpr]].
  *
  * Scale shape: ≤ K longs of state per key; each micro-batch shuffles
  * its rows once on the key and touches only the keys present.
  */
object KmvStream {

  final case class Obs(key: String, h: Long)

  /** Refreshed sketch summary per (key, batch). */
  final case class SketchRow(key: String, sk_size: Long, kth_h: Long)

  final case class Sk(mins: Array[Long])

  class KmvProcessor extends StatefulProcessor[String, Obs, SketchRow] {
    @transient private var st: ValueState[Sk] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Sk](
        "kmv",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Sk](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[SketchRow] = {
      val prev = if (st.exists()) st.get().mins else Array.empty[Long]
      val merged = Kmv.merge(prev, rows.map(_.h))
      st.update(Sk(merged))
      Iterator.single(SketchRow(key, merged.length.toLong, merged.max))
    }
  }

  /** Estimate stream over (key, h) observations: one refreshed
    * (key, sk_size, kth_h, est) row per touched key per micro-batch.
    */
  def estimates(obs: Dataset[Obs]): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .transformWithState(
        new KmvProcessor, TimeMode.None(), OutputMode.Append())
      .toDF()
      .withColumn("est", Kmv.estExpr)
  }
}

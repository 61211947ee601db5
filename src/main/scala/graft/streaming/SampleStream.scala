package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Md5Prefix60

/** Streaming per-group deterministic sampler — the live twin of the
  * batch hash-ordered samplers (q_sample_per_group / q_split_sets
  * family): keep, per group, the `SampleK` items with the SMALLEST
  * `(md5p60(id), id)` key. Bottom-k under a fixed hash order is a
  * uniform sample of everything seen AND a mergeable sketch, so after
  * any stream prefix the kept set is EXACTLY the batch sampler's
  * output over the same rows (the parity spec pins it) — the standard
  * bottom-k trick that turns "reservoir sampling" into deterministic,
  * replayable, partition-invariant state.
  *
  * Scale shape: O(k)/group state in one ValueState row; each batch
  * folds its rows locally (only candidates below the current k-th key
  * matter) and rewrites state once. No randomness, no timers.
  */
object SampleStream {

  val SampleK = 8

  final case class Doc(grp: String, id: Long)

  /** `ids` = the current sample, ascending by id, comma-joined (the
    * no-raw-arrays output convention).
    */
  final case class Sample(grp: String, n_seen: Long, ids: String)

  private[streaming] def hashKey(id: Long): (Long, Long) =
    (Md5Prefix60.hash60(UTF8String.fromString(id.toString)), id)

  /** The batch rule on an in-memory group: bottom-k by (hash, id). */
  private[streaming] def bottomK(ids: Seq[Long]): Seq[Long] =
    ids.distinct.map(hashKey).sorted.take(SampleK).map(_._2)

  class SampleProcessor extends StatefulProcessor[String, Doc, Sample] {
    // (n_seen, kept ids ascending) — one O(k) row per group
    @transient private var st: ValueState[(Long, Seq[Long])] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Seq[Long])](
        "sample",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[Long])](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[Doc],
        timerValues: TimerValues): Iterator[Sample] = {
      val incoming = rows.map(_.id).toSeq
      if (incoming.isEmpty) Iterator.empty
      else {
        val (n0, kept0) =
          if (st.exists()) st.get() else (0L, Seq.empty[Long])
        // ids are unique in the source; count first, then merge-trim
        val n1 = n0 + incoming.size
        val merged = (kept0 ++ incoming).distinct
          .map(hashKey).sorted.take(SampleK).map(_._2)
        st.update((n1, merged))
        Iterator.single(Sample(key, n1, merged.sorted.mkString(",")))
      }
    }
  }

  /** One sample row per touched group per micro-batch. Requires the
    * RocksDB state store provider (transformWithState).
    */
  def samples(docs: Dataset[Doc]): Dataset[Sample] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.grp)
      .transformWithState(
        new SampleProcessor, TimeMode.None(), OutputMode.Append())
  }
}

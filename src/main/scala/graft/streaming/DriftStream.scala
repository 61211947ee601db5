package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of `q_dist_drift`: watch an arriving document stream
  * against a frozen baseline token distribution and keep per-token
  * running counts in keyed state, so the add-1-smoothed KL drift
  * contributions can be scored at any moment with the EXACT batch
  * formula (same 1e6-quantized `ln` expression — [[klContrib]] is the
  * single source both paths share, so stream-scored drift is
  * bit-identical to `q_dist_drift` over the same documents; the parity
  * spec pins this).
  *
  * Scale shape: the stream flatMaps to tokens and keys BY TOKEN —
  * state is one int64 per observed token (vocabulary-bounded, not
  * stream-bounded), emissions are (token, running count) for tokens
  * touched by the batch, and counts are monotone so the latest
  * emission per token IS the snapshot (no sink-order dependence).
  */
object DriftStream {

  final case class Tok(token: String)

  final case class TokCount(token: String, ca: Long)

  class CountProcessor extends StatefulProcessor[String, Tok, TokCount] {
    @transient private var st: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Long](
        "cnt",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long](),
        TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[Tok],
        timerValues: TimerValues): Iterator[TokCount] = {
      val n = (if (st.exists()) st.get() else 0L) + rows.size
      st.update(n)
      Iterator.single(TokCount(key, n))
    }
  }

  /** Running per-token counts over a document text stream (whitespace
    * tokens, empties dropped — the q_dist_drift tokenization).
    */
  def counts(texts: Dataset[String]): Dataset[TokCount] = {
    val spark = texts.sparkSession
    import spark.implicits._
    texts.flatMap(_.split(" ").filter(_.nonEmpty)).map(Tok(_))
      .groupByKey(_.token)
      .transformWithState(
        new CountProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** The q_dist_drift contribution expression over columns
    * (ca, cb, na, nb, v) — single source for the batch query, the
    * stream scorer, and (textually mirrored with `//`) the DuckDB
    * oracle: floor(ln((ca+1)(nb+v) / ((cb+1)(na+v))) * (ca+1) * 1e6
    * / (na+v)).
    *
    * Int64 headroom contract (the PageRank/PcaPower/q_ols_trend
    * convention): the raw-count products (ca+1)*(nb+v) and
    * (cb+1)*(na+v) must stay under 2^63, i.e. roughly
    * (max(ca, cb) + 1) * (na + nb + v) < 2^63. With per-token counts
    * bounded by the total that means total corpus tokens below ~3e9
    * per side is always safe; ANSI mode makes a breach a loud overflow
    * error, never silent corruption. Mitigation at larger corpora:
    * compute the distributions over a hash-sampled token stream
    * (deterministic md5-threshold sampling, the q_sample_docs shape) or
    * rescale both sides' counts by a common power of two before
    * scoring — the contribution ranking is scale-invariant up to the
    * +1 smoothing.
    */
  val klContrib: String =
    """CAST(floor(ln(((ca + 1) * (nb + v)) * 1e0 / ((cb + 1) * (na + v)))
      |  * (ca + 1) * 1e6 / (na + v)) AS BIGINT)""".stripMargin

  /** Score a count snapshot (token, ca) against a baseline (token, cb):
    * top-`limit` drifted tokens by the exact contribution formula,
    * smoothing over the UNION vocabulary — the same frame q_dist_drift
    * emits, computable from the stream state at any point.
    */
  def score(observed: DataFrame, baseline: DataFrame, limit: Int = 30): DataFrame = {
    val joined = observed.select(col("token"), col("ca"))
      .join(baseline.select(col("token"), col("cb")), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = joined.agg(count(lit(1)).as("v"),
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    joined.crossJoin(broadcast(tot))
      .select(col("token"), col("ca"), col("cb"),
        expr(klContrib).as("contrib_fp"))
      .orderBy(col("contrib_fp").desc, col("token"))
      .limit(limit)
  }
}

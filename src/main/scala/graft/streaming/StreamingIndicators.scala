package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{Candle, EnrichedCandle}

/** Streaming replacement for the reference's driver-side recompute-all loop
  * (/root/reference/services/stream-processing/app/consumer.py:160-223).
  *
  * The reference appends every micro-batch to an unbounded pandas DataFrame
  * and recomputes ALL indicators over the FULL history each batch — O(total
  * history) per batch on one process, state lost on restart. Here the same
  * emitted values come from O(1)-per-key incremental state on Spark's
  * checkpointed state store:
  *
  *   - state per symbol = previous close, EMA accumulator, observation
  *     count, last-5 closes, last-10 defined gains/losses — a few hundred
  *     bytes regardless of history length;
  *   - `withWatermark` + `dropDuplicates` replaces the reference's in-memory
  *     `already_sent` set (consumer.py:27-28,199-205) with a bounded,
  *     fault-tolerant dedup (the reference re-emits everything after
  *     restart; we do not);
  *   - partitioned by symbol via `groupByKey` — scales horizontally with
  *     executors, unlike the single-process pandas loop.
  *
  * CONTRACT (golden-tested): for ordered, on-time input the streaming output
  * is bit-identical to the batch `graft.ops.Indicators.enrich` pipeline.
  */
object StreamingIndicators {

  /** Per-symbol incremental state. `gains`/`losses` hold only *defined*
    * gains (the first row of a key has null delta, hence no gain); pandas'
    * rolling(10, min_periods=10) over the gain column is null exactly while
    * the 10-row window still covers that first row, i.e. until obs >= 11.
    */
  case class IndState(
      prevClose: Option[Double],
      ema: Option[Double],
      obs: Int,
      closes: Array[Double],
      gains: Array[Double],
      losses: Array[Double])

  private val alpha = 2.0 / 11.0

  /** Advance state by one candle, producing the enriched row. */
  def step(st: IndState, c: Candle): (IndState, EnrichedCandle) = {
    val x = c.close
    val obs = st.obs + 1
    val closes = (st.closes :+ x).takeRight(5)
    val sma5 = if (closes.length == 5) Some(closes.sum / 5.0) else None
    val emaAcc = st.ema match {
      case None    => x
      case Some(e) => (1 - alpha) * e + alpha * x
    }
    val ema10 = if (obs >= 10) Some(emaAcc) else None
    val delta = st.prevClose.map(x - _)
    // greatest(d, 0.0) in Spark/DuckDB keeps the FIRST arg on ties, so a
    // zero delta yields loss = -0.0 (like pandas -delta.clip(upper=0));
    // math.max would normalize to +0.0 and break bit-parity with batch
    val gain = delta.map(d => if (d >= 0.0) d else 0.0)
    val loss = delta.map { d => val n = -d; if (n >= 0.0) n else 0.0 }
    val gains = (st.gains ++ gain).takeRight(10)
    val losses = (st.losses ++ loss).takeRight(10)
    val avgGain = if (obs >= 11) Some(gains.sum / 10.0) else None
    val avgLoss = if (obs >= 11) Some(losses.sum / 10.0) else None
    val rs = for (g <- avgGain; l <- avgLoss if l != 0.0) yield g / l
    val rsi = rs.map(r => 100.0 - 100.0 / (1.0 + r))
    val signal = (sma5, ema10, rsi) match {
      case (Some(s), Some(e), Some(r)) =>
        if (s > e && r < 70.0) "BUY"
        else if (s < e && r > 30.0) "SELL"
        else "HOLD"
      case _ => "HOLD"
    }
    val out = EnrichedCandle(
      c.stock_symbol, c.local_time, c.open, c.high, c.low, c.close, c.volume,
      sma5, ema10, delta, gain, loss, avgGain, avgLoss, rs, rsi, signal)
    (IndState(Some(x), Some(emaAcc), obs, closes, gains, losses), out)
  }

  val emptyState: IndState =
    IndState(None, None, 0, Array.empty, Array.empty, Array.empty)

  /** Total order on candles within a (symbol, batch) slice: time first,
    * then the payload, so equal-timestamp rows fold in a deterministic
    * order regardless of shuffle arrival.
    */
  private def candleSortKey(c: Candle) =
    (c.local_time.getTime, c.close, c.open, c.high, c.low, c.volume)

  private def advanceGroup(
      key: String,
      rows: Iterator[Candle],
      state: GroupState[IndState]): Iterator[EnrichedCandle] = {
    // rows within a micro-batch arrive unordered; sort this batch's slice.
    // Tie-break on the payload so duplicate timestamps (possible when the
    // caller skips the dedup gate) still fold deterministically.
    // (cross-batch order is the source's responsibility; late rows are
    // handled by the watermarked dedup upstream.)
    val sorted = rows.toSeq.sortBy(candleSortKey)
    var st = state.getOption.getOrElse(emptyState)
    val out = sorted.map { c =>
      val (next, enriched) = step(st, c)
      st = next
      enriched
    }
    state.update(st)
    out.iterator
  }

  /** Candle stream -> enriched stream (append mode), incremental state. */
  def enrichStream(candles: Dataset[Candle]): Dataset[EnrichedCandle] = {
    val spark = candles.sparkSession
    import spark.implicits._
    candles
      .groupByKey(_.stock_symbol)
      .flatMapGroupsWithState[IndState, EnrichedCandle](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(advanceGroup)
  }

  /** The same incremental enrichment on Spark 4's arbitrary-state API
    * (`transformWithState` / `StatefulProcessor`) — the successor to
    * flatMapGroupsWithState, with typed per-key state variables and state
    * schema evolution. Identical output (shares [[step]]).
    *
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — the only provider backing
    * the new API.
    */
  class IndicatorProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, Candle, EnrichedCandle] {
    @transient private var state:
        org.apache.spark.sql.streaming.ValueState[IndState] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[IndState](
        "indicators",
        org.apache.spark.sql.Encoders.product[IndState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[Candle],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[EnrichedCandle] = {
      val sorted = rows.toSeq.sortBy(candleSortKey)
      var st = if (state.exists()) state.get() else emptyState
      val out = sorted.map { c =>
        val (next, enriched) = step(st, c)
        st = next
        enriched
      }
      state.update(st)
      out.iterator
    }
  }

  /** [[enrichStream]] on the transformWithState API. */
  def enrichStreamTWS(candles: Dataset[Candle]): Dataset[EnrichedCandle] = {
    val spark = candles.sparkSession
    import spark.implicits._
    candles
      .groupByKey(_.stock_symbol)
      .transformWithState(
        new IndicatorProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** Watermarked dedup gate (replaces the reference's `already_sent` set,
    * K6): at-most-one row per (symbol, local_time) within the watermark
    * horizon, state evicted as the watermark advances.
    */
  def dedupGate(candles: Dataset[Candle], watermark: String): Dataset[Candle] = {
    val spark = candles.sparkSession
    import spark.implicits._
    candles
      .withWatermark("local_time", watermark)
      .dropDuplicates("stock_symbol", "local_time")
      .as[Candle]
  }

  /** Full pipeline: dedup gate -> incremental enrichment. */
  def pipeline(candles: Dataset[Candle], watermark: String = "1 hour")
      : Dataset[EnrichedCandle] =
    enrichStream(dedupGate(candles, watermark))

  /** Persist the enriched stream into the day-partitioned store — the
    * replacement for the reference's row-at-a-time QuestDB sinks (K4/K5,
    * kafka-to-questdb/consumer.py:60-80). Uses the NATIVE parquet
    * streaming sink (not foreachBatch + blind append, which is only
    * at-least-once on micro-batch replay): the sink's file manifest
    * commits atomically with the checkpoint epoch, so replayed batches
    * never double-write. Returns the started query.
    */
  def sinkToStore(
      enriched: Dataset[EnrichedCandle],
      storePath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    enriched
      .withColumn(graft.sources.PartitionedStore.PartitionCol,
        to_date(col("local_time")))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", storePath)
      .option("checkpointLocation", checkpoint)
      .partitionBy(graft.sources.PartitionedStore.PartitionCol)
      .start()

  /** Kafka-sink projection: key = symbol, value = JSON of all 17 fields —
    * the reference's output_topic record shape (consumer.py:211-219).
    */
  def toKafkaFrame(enriched: Dataset[EnrichedCandle]): DataFrame =
    enriched.select(
      col("stock_symbol").as("key"),
      to_json(struct(col("*"))).as("value"))

  /** Watermarked tumbling-window OHLC resampling on the live stream — the
    * streaming twin of the batch `q_ohlc_bars` operator. Late rows beyond
    * the watermark are dropped; each bar is emitted once, when the
    * watermark passes its end (append mode). `min_by`/`max_by` on event
    * time give open/close without a per-window sort, so the whole thing is
    * one shuffled streaming aggregation with bounded state (open windows
    * only).
    */
  def windowedOhlc(
      candles: Dataset[Candle],
      barWidth: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    candles
      .withWatermark("local_time", watermark)
      .groupBy(
        col("stock_symbol"),
        window(col("local_time"), barWidth).as("bar"))
      .agg(
        // struct ordering keys make equal-timestamp ticks deterministic
        // even when the caller skips the dedup gate
        min_by(col("open"), struct(col("local_time"), col("open"))).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), struct(col("local_time"), col("close"))).as("close"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("n_ticks"))
      .select(
        col("stock_symbol"), col("bar.start").as("bar_ts"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("n_ticks"))

  /** Watermarked streaming sessionization: activity sessions per key close
    * after `gap` of event-time silence and emit once the watermark passes
    * (append mode). The streaming twin of the batch gap-based q_sessions
    * operator, on Spark's native `session_window` (state = open sessions
    * only, merged incrementally — no per-event state accumulation).
    */
  def sessionize(
      events: DataFrame,
      keyCol: String = "stock_symbol",
      timeCol: String = "local_time",
      valueCol: String = "close",
      gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(col(keyCol), session_window(col(timeCol), gap).as("sess"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        sum(col(valueCol)).as("sum_value"))
      .select(
        col(keyCol), col("sess.start").as("window_start"),
        col("sess.end").as("window_end"), col("n_events"),
        col("session_start"), col("session_end"), col("sum_value"))

  /** Stream-stream interval join: each left-stream event matched to all
    * right-stream events for the same key within `[t - lookback, t]` —
    * trade-to-quote matching, order-to-fill correlation, etc. Watermarks
    * on BOTH sides bound the join state (Spark evicts buffered rows once
    * they can no longer match), so state stays proportional to the
    * lookback window, not the stream history.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String = "stock_symbol",
      timeCol: String = "local_time",
      lookback: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(timeCol, watermark).alias("l")
    val r = right.withWatermark(timeCol, watermark).alias("r")
    l.join(
      r,
      expr(
        s"""l.$keyCol = r.$keyCol AND
           |r.$timeCol BETWEEN l.$timeCol - INTERVAL $lookback AND l.$timeCol
           |""".stripMargin))
  }

  /** LEFT OUTER variant of [[intervalJoin]]: every left row is emitted —
    * matched rows as soon as the match arrives, UNMATCHED rows
    * null-padded only once the watermark passes the end of their match
    * interval (before that a matching right row could still arrive, so
    * emitting early would be wrong; this deferred null emission is the
    * part the inner join doesn't exercise). Same bounded state: both
    * sides evict with the watermark.
    */
  def intervalJoinOuter(
      left: DataFrame,
      right: DataFrame,
      keyCol: String = "stock_symbol",
      timeCol: String = "local_time",
      lookback: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(timeCol, watermark).alias("l")
    val r = right.withWatermark(timeCol, watermark).alias("r")
    l.join(
      r,
      expr(
        s"""l.$keyCol = r.$keyCol AND
           |r.$timeCol BETWEEN l.$timeCol - INTERVAL $lookback AND l.$timeCol
           |""".stripMargin),
      "leftOuter")
  }

  /** The reference's input decode (S3): Kafka value bytes -> Candle columns
    * (consumer.py:254-256 with the schema at consumer.py:235-243).
    */
  def decodeCandleJson(raw: DataFrame): Dataset[Candle] = {
    val spark = raw.sparkSession
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[Candle].schema
    raw
      .select(from_json(col("value").cast("string"), schema).as("data"))
      .select("data.*")
      .as[Candle]
  }
}

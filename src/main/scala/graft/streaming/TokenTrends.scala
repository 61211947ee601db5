package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.ops.HeavyHitters

/** Streaming heavy hitters over the document token stream: sharded
  * Misra-Gries sketches in keyed state — the streaming face of
  * [[graft.ops.HeavyHitters]] (same fold, same bounds).
  *
  * Layout: tokens hash-route to `shards` keys; each shard holds ONE
  * bounded MG sketch (k-1 entries) plus its processed count. Total state
  * is O(shards * k) — independent of vocabulary and stream length,
  * unlike a per-token count state (one entry per distinct token, i.e.
  * O(vocabulary), which for n-grams grows with the corpus).
  *
  * Guarantee carried over from the batch sketch: a token's occurrences
  * all land in one shard, and n_shard <= n, so any token with GLOBAL
  * count > n/k (> n_shard/k a fortiori) is present in its shard's
  * sketch — no false negatives at any shard count. Estimates are within
  * [true - n_shard/k, true].
  *
  * Sizing: the whole token stream folds through `shards` state tasks,
  * so shards is the fold parallelism ceiling — size it to the cluster
  * (a few × total cores), not to the default. State stays tiny either
  * way (shards * k entries), and the guarantee above is shard-count
  * independent, so over-sharding costs nothing but output rows. Each batch re-emits the shard's sketch
  * tagged with n_shard; readers keep the rows with the highest n_shard
  * per shard (the latest snapshot) and can feed the candidate set to the
  * exact batch recount ([[HeavyHitters.exactHeavyHitters]] pass 2) when
  * exact counts are needed.
  */
object TokenTrends {

  final case class TokenRow(shard: Long, tok: String)

  /** One sketch entry of shard `shard` after `n_shard` processed tokens. */
  final case class SketchEntry(shard: Long, n_shard: Long, tok: String, est: Long)

  class ShardSketchProcessor(k: Int)
      extends StatefulProcessor[Long, TokenRow, SketchEntry] {
    @transient private var st: ValueState[(Long, Map[String, Long])] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Map[String, Long])](
        "mg", ExpressionEncoder[(Long, Map[String, Long])](), TTLConfig.NONE)
    override def handleInputRows(
        key: Long, rows: Iterator[TokenRow],
        timerValues: TimerValues): Iterator[SketchEntry] = {
      val mg = new HeavyHitters.MisraGries(k)
      var (n, b) =
        if (st.exists()) st.get() else (0L, Map.empty[String, Long])
      rows.foreach { r => b = mg.reduce(b, r.tok); n += 1 }
      st.update((n, b))
      // a decrement cascade can leave the sketch EMPTY at a batch edge
      // (k-1 count-1 entries evicted together); still emit the processed
      // count so the latest n_shard snapshot never goes stale — est = 0
      // marks the marker row (real MG estimates are always >= 1)
      if (b.isEmpty) Iterator.single(SketchEntry(key, n, "", 0L))
      else b.iterator.map { case (t, c) => SketchEntry(key, n, t, c) }
    }
  }

  /** Sharded trending-token sketches over a document stream. Requires
    * the RocksDB state store provider (transformWithState).
    */
  def trendingTokens(
      docs: Dataset[DocStream.DocEvent],
      shards: Int = 16, k: Int = 32): Dataset[SketchEntry] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF()
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(
        pmod(xxhash64(col("tok")), lit(shards.toLong)).as("shard"),
        col("tok"))
      .as[TokenRow]
      .groupByKey(_.shard)
      .transformWithState(
        new ShardSketchProcessor(k), TimeMode.None(), OutputMode.Append())
  }

  final case class WindowTokenRow(wkey: String, tok: String)

  /** One sketch entry of tumbling window `window_start` (epoch seconds),
    * shard `shard`, after `n_shard` tokens of that (window, shard).
    */
  final case class WindowedSketchEntry(
      window_start: Long, shard: Long, n_shard: Long, tok: String, est: Long)

  class WindowedSketchProcessor(k: Int, ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, WindowTokenRow, WindowedSketchEntry] {
    @transient private var st: ValueState[(Long, Map[String, Long])] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Map[String, Long])](
        "mgw", ExpressionEncoder[(Long, Map[String, Long])](),
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))
    override def handleInputRows(
        key: String, rows: Iterator[WindowTokenRow],
        timerValues: TimerValues): Iterator[WindowedSketchEntry] = {
      val Array(win, shard) = key.split(":", 2).map(_.toLong)
      val mg = new HeavyHitters.MisraGries(k)
      var (n, b) =
        if (st.exists()) st.get() else (0L, Map.empty[String, Long])
      rows.foreach { r => b = mg.reduce(b, r.tok); n += 1 }
      st.update((n, b))
      if (b.isEmpty) Iterator.single(WindowedSketchEntry(win, shard, n, "", 0L))
      else b.iterator.map { case (t, c) => WindowedSketchEntry(win, shard, n, t, c) }
    }
  }

  /** PER-WINDOW trending tokens: tumbling event-time windows of
    * `windowSeconds`, each with its own sharded MG sketches — the
    * "what's hot this hour" semantic, vs [[trendingTokens]]'s all-time
    * sketch. State is one (count, sketch) per live (window, shard) key;
    * pass `ttl` (>= the out-of-orderness you accept) so closed windows'
    * sketches age out instead of accumulating one key per window
    * forever — with a TTL the stream runs in processing-time mode, so
    * pace the trigger as documented on `DocStream.nearDupGate`.
    */
  def trendingTokensWindowed(
      docs: Dataset[DocStream.DocEvent],
      windowSeconds: Long = 3600L,
      shards: Int = 16, k: Int = 32,
      ttl: Option[java.time.Duration] = None): Dataset[WindowedSketchEntry] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeMode =
      if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    docs.toDF()
      .select(col("ingest_ts"), explode(split(col("text"), " ")).as("tok"))
      .select(
        concat(
          (unix_timestamp(col("ingest_ts"))
            - pmod(unix_timestamp(col("ingest_ts")), lit(windowSeconds)))
            .cast("string"),
          lit(":"),
          pmod(xxhash64(col("tok")), lit(shards.toLong)).cast("string"))
          .as("wkey"),
        col("tok"))
      .as[WindowTokenRow]
      .groupByKey(_.wkey)
      .transformWithState(
        new WindowedSketchProcessor(k, ttl), timeMode, OutputMode.Append())
  }
}

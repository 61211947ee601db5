package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Candle

/** Ingestion-edge adapter — the engine-side equivalent of the reference's
  * data-ingestion service (/root/reference/services/data-ingestion/app/
  * ingest.py:60-121): poll a source, shape each candle as a JSON record
  * keyed by symbol, route to the per-symbol topic `<symbol_lower>_topic`
  * (ingest.py:101, P10 in SURVEY.md §2.3).
  *
  * The HTTP poll itself stays outside the engine (an adapter concern); what
  * the engine owns is the wire shape and routing, which this object
  * produces from any candle Dataset — batch (replay from the store) or
  * streaming (readStream source). The output frame has Kafka-sink columns
  * (`topic`, `key`, `value`), so `.write[Stream].format("kafka")` publishes
  * the reference's exact 5-topic layout without further transformation.
  */
object CandleReplay {

  /** Kafka-frame projection with per-symbol topic routing: one record per
    * candle, key = symbol, topic = `<symbol_lower>_topic`, value = the
    * 7-field JSON payload of ingest.py:89-97.
    */
  def toTopicFrames(candles: Dataset[Candle]): DataFrame =
    candles.select(
      concat(lower(col("stock_symbol")), lit("_topic")).as("topic"),
      col("stock_symbol").as("key"),
      to_json(struct(
        col("stock_symbol"), col("local_time"), col("open"), col("high"),
        col("low"), col("close"), col("volume"))).as("value"))

  /** Batch replay: read candles back out of the partitioned store within a
    * time range (partition-pruned) and shape them for publishing — the
    * "backfill a topic from the table" path.
    */
  def replayRange(
      spark: SparkSession,
      storePath: String,
      start: java.sql.Timestamp,
      end: java.sql.Timestamp): DataFrame = {
    import spark.implicits._
    val candles = PartitionedStore
      .readRange(spark, storePath, start, end)
      .select("stock_symbol", "local_time", "open", "high", "low", "close",
        "volume")
      .as[Candle]
    toTopicFrames(candles)
  }
}

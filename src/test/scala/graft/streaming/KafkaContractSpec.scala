package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Candle
import graft.sources.CandleReplay

/** Wire-contract tests for the Kafka seam (SURVEY.md §2.1/§2.2).
  *
  * No Kafka broker or spark-sql-kafka connector exists in this sandbox
  * (zero egress; /opt/spark/jars carries no kafka artifact), so
  * `format("kafka")` itself cannot be exercised — README documents that
  * boundary. What CAN be pinned, and is pinned here, is both sides of the
  * wire contract the connector defines:
  *
  *   - source side: `decodeCandleJson` must accept the EXACT 7-column
  *     frame a Kafka source produces (key/value BINARY, topic, partition,
  *     offset, timestamp, timestampType) — not a convenience string frame;
  *   - sink side: `toKafkaFrame` / `toTopicFrames` must emit only columns
  *     the Kafka sink accepts (topic/key/value, string or binary), with
  *     the reference's exact payload field set.
  */
class KafkaContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The documented schema of a `format("kafka")` source row. */
  private val kafkaSourceSchema = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  test("decodeCandleJson accepts the exact kafka-source frame (binary value + metadata cols)") {
    val payload =
      """{"stock_symbol":"BTCIRT","local_time":"2024-01-01 00:01:00","open":1.0,"high":2.0,"low":0.5,"close":1.5,"volume":7.0}"""
    val row = org.apache.spark.sql.Row(
      "BTCIRT".getBytes("UTF-8"), payload.getBytes("UTF-8"),
      "btcirt_topic", 0, 42L, Timestamp.valueOf("2024-01-01 00:01:05"), 0)
    val raw = spark.createDataFrame(
      java.util.Arrays.asList(row), kafkaSourceSchema)
    val decoded = StreamingIndicators.decodeCandleJson(raw).collect()
    assert(decoded.length == 1)
    assert(decoded.head == Candle(
      "BTCIRT", Timestamp.valueOf("2024-01-01 00:01:00"), 1.0, 2.0, 0.5, 1.5, 7.0))
  }

  test("toTopicFrames emits only kafka-sink columns with sink-legal types") {
    import spark.implicits._
    val df = CandleReplay.toTopicFrames(spark.createDataset(Seq(
      Candle("BTCIRT", Timestamp.valueOf("2024-01-01 00:01:00"), 1, 2, 0.5, 1.5, 7))))
    // the kafka sink reads exactly these columns; key/value must be
    // string or binary, topic must be string
    assert(df.schema.fields.map(f => f.name -> f.dataType).toSeq == Seq(
      "topic" -> StringType, "key" -> StringType, "value" -> StringType))
    val row = df.collect().head
    assert(row.getAs[String]("topic") == "btcirt_topic")
    assert(row.getAs[String]("key") == "BTCIRT")
    // reference payload contract: exactly the 7 candle fields, no extras
    val keys = "\"(\\w+)\":".r.findAllMatchIn(row.getAs[String]("value"))
      .map(_.group(1)).toSet
    assert(keys == Set("stock_symbol", "local_time", "open", "high", "low",
      "close", "volume"))
  }

  test("toKafkaFrame emits sink-legal (key, value) with the 17-field enriched record") {
    import spark.implicits._
    val df = StreamingIndicators.toKafkaFrame(spark.createDataset(Seq(
      graft.model.EnrichedCandle("AAA",
        Timestamp.valueOf("2024-01-01 00:00:00"), 1, 2, 0.5, 1.5, 100,
        None, None, None, None, None, None, None, None, None, "HOLD"))))
    assert(df.schema.fields.map(f => f.name -> f.dataType).toSeq == Seq(
      "key" -> StringType, "value" -> StringType))
    val keys = "\"(\\w+)\":".r.findAllMatchIn(df.collect().head.getAs[String]("value"))
      .map(_.group(1)).toSet
    // to_json drops null (None) indicator fields; the non-null core +
    // signal must be present
    assert(Set("stock_symbol", "local_time", "open", "high", "low", "close",
      "volume", "signal").subsetOf(keys))
  }

  test("round-trip: sink frame value decodes back to the identical candle") {
    import spark.implicits._
    val candles = Seq(
      Candle("ETHIRT", Timestamp.valueOf("2024-02-01 10:00:00"), 10, 20, 5, 15, 3),
      Candle("BTCIRT", Timestamp.valueOf("2024-02-01 10:01:00"), 1, 2, 0.5, 1.5, 7))
    val wire = CandleReplay.toTopicFrames(spark.createDataset(candles))
      // reduce to the kafka-source shape a consumer would see
      .selectExpr("CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value",
        "topic", "CAST(0 AS INT) AS partition", "CAST(0 AS BIGINT) AS offset",
        "CAST(NULL AS TIMESTAMP) AS timestamp", "CAST(0 AS INT) AS timestampType")
    val back = StreamingIndicators.decodeCandleJson(wire).collect().toSet
    assert(back == candles.toSet)
  }
}

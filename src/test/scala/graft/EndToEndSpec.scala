package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.api.StockApi
import graft.model.Candle
import graft.ops.Indicators
import graft.sources.{CandleReplay, PartitionedStore}

/** The full user journey of the reference system, end-to-end through this
  * library: candles -> indicator/signal enrichment -> day-partitioned
  * store -> REST-shaped aggregation queries -> topic replay -> stream
  * decode round-trip. Every hop is the production path (no test doubles).
  */
class EndToEndSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("candles -> enrich -> store -> API -> replay -> decode") {
    val s = spark
    import s.implicits._

    // 1. two days of 1-minute candles, two symbols
    val candles = for {
      (day, base) <- Seq(("2024-03-01", 100.0), ("2024-03-02", 110.0))
      sym <- Seq("BTCIRT", "ETHIRT")
      i <- 0 until 30
    } yield Candle(sym, Timestamp.valueOf(f"$day 10:$i%02d:00"),
      base + i, base + i + 1, base + i - 1, base + i + 0.5, 1000.0 + i)

    // 2. batch enrichment (indicators + signal)
    val enriched = Indicators.enrich(
      candles.toDF(), col("stock_symbol"), col("local_time"), col("close"))
    enriched.columns should contain allOf ("sma_5", "ema_10", "rsi_10", "signal")

    // 3. day-partitioned store
    val store = Files.createTempDirectory("graft_e2e").toString + "/stock_data"
    PartitionedStore.write(enriched, store)
    val back = PartitionedStore.read(spark, store)
    back.count() shouldBe candles.size
    back.select("trade_date").distinct().count() shouldBe 2

    // 4. REST-shaped queries over the store (the reference's API surface)
    val now = Timestamp.valueOf("2024-03-02 10:29:00")
    val summary = StockApi.summarize(back, "BTCIRT", periodMinutes = 30, now)
    summary.summary.close.highest shouldBe defined
    summary.summary.close.highest.get shouldBe 139.5 // 110+29+0.5
    val multi = StockApi.summarizeMultiple(
      back, Seq("BTCIRT", "ETHIRT", "DOGE"), 30, now)
    multi.summaries.keySet shouldBe Set("BTCIRT", "ETHIRT")
    multi.errors.keySet shouldBe Set("DOGE")

    // 5. replay a pruned day back out as keyed topic frames...
    val frames = CandleReplay.replayRange(
      spark, store,
      Timestamp.valueOf("2024-03-02 00:00:00"),
      Timestamp.valueOf("2024-03-02 23:59:59"))
    frames.count() shouldBe 60
    frames.select("topic").distinct().collect()
      .map(_.getString(0)).sorted shouldBe Array("btcirt_topic", "ethirt_topic")

    // 6. ...and the stream-side decoder reads them back losslessly
    val decoded = graft.streaming.StreamingIndicators
      .decodeCandleJson(frames.select("value"))
      .collect()
    decoded.length shouldBe 60
    decoded.map(_.stock_symbol).toSet shouldBe Set("BTCIRT", "ETHIRT")
    val orig = candles.filter(c =>
      c.local_time.toString.startsWith("2024-03-02")).toSet
    decoded.toSet shouldBe orig
  }
}

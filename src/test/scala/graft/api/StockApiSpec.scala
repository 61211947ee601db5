package graft.api

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** StockApi — the three REST endpoint shapes of the reference
  * (/root/reference/services/aggregator_django/aggregator/views.py).
  */
class StockApiSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  /** stock_data-shaped frame: 2 symbols, 1-minute bars. */
  private lazy val stockData = {
    val s = spark
    import s.implicits._
    Seq(
      // (symbol, time, close, sma_5, ema_10, rsi_10, gain, loss)
      ("BTC", "2024-01-01 10:00:00", 100.0, Some(99.0), Some(98.0), Some(55.0), Some(1.0), Some(0.0)),
      ("BTC", "2024-01-01 10:01:00", 102.0, Some(100.0), Some(99.0), Some(60.0), Some(2.0), Some(0.0)),
      ("BTC", "2024-01-01 10:02:00", 101.0, Some(100.5), Some(99.5), Some(58.0), Some(0.0), Some(1.0)),
      ("ETH", "2024-01-01 10:01:00", 50.0, None, None, None, None, None),
      ("ETH", "2024-01-01 10:02:00", 52.0, Some(51.0), Some(50.5), Some(65.0), Some(2.0), Some(0.0))
    ).toDF("stock_symbol", "local_time_s", "close", "sma_5", "ema_10", "rsi_10", "gain", "loss")
      .selectExpr("stock_symbol", "CAST(local_time_s AS TIMESTAMP) AS local_time",
        "close", "sma_5", "ema_10", "rsi_10", "gain", "loss")
  }

  private val now = ts("2024-01-01 10:02:00")

  test("aggregate avg/highest/lowest over closed interval (views.py:117-177)") {
    // closed interval [10:01:00, 10:02:00] -> BTC rows 2,3
    val avg = StockApi.aggregate(stockData, "avg", "BTC", 1, "close", now)
    avg.value.get shouldBe 101.5 +- 1e-12
    avg.field shouldBe "close"

    StockApi.aggregate(stockData, "highest", "BTC", 1, "close", now).value.get shouldBe 102.0
    StockApi.aggregate(stockData, "lowest", "BTC", 1, "close", now).value.get shouldBe 101.0
    // 2-minute window picks up the 10:00 row too
    StockApi.aggregate(stockData, "highest", "BTC", 2, "close", now).value.get shouldBe 102.0
    StockApi.aggregate(stockData, "lowest", "BTC", 2, "close", now).value.get shouldBe 100.0
  }

  test("aggregate: field whitelist and aggregation validation") {
    an[IllegalArgumentException] should be thrownBy
      StockApi.aggregate(stockData, "avg", "BTC", 1, "nope", now)
    an[IllegalArgumentException] should be thrownBy
      StockApi.aggregate(stockData, "median", "BTC", 1, "close", now)
    // case-insensitive field names (serializer whitelists SMA_5 etc.)
    StockApi.aggregate(stockData, "avg", "BTC", 1, "SMA_5", now).field shouldBe "sma_5"
  }

  test("aggregate over empty range yields None, not an error") {
    StockApi.aggregate(stockData, "avg", "DOGE", 60, "close", now).value shouldBe None
  }

  test("summarize: 14-aggregate shape (views.py:61-114)") {
    val r = StockApi.summarize(stockData, "BTC", 60, now)
    r.stockSymbol shouldBe "BTC"
    r.period shouldBe 60
    r.summary.close.avg.get shouldBe 101.0 +- 1e-12
    r.summary.close.highest.get shouldBe 102.0
    r.summary.close.lowest.get shouldBe 100.0
    r.summary.sma5.avg.get shouldBe ((99.0 + 100.0 + 100.5) / 3) +- 1e-12
    r.summary.gainLoss.highestGain.get shouldBe 2.0
    r.summary.gainLoss.highestLoss.get shouldBe 1.0
  }

  test("summarize: nulls in indicator columns are skipped by aggregates") {
    val r = StockApi.summarize(stockData, "ETH", 60, now)
    // ETH row 1 has null indicators -> aggregates over the non-null row only
    r.summary.sma5.avg.get shouldBe 51.0 +- 1e-12
    r.summary.close.avg.get shouldBe 51.0 +- 1e-12
  }

  test("summarizeMultiple: one pass, per-symbol summaries + error map (views.py:239-305)") {
    val r = StockApi.summarizeMultiple(stockData, Seq("BTC", "ETH", "DOGE"), 60, now)
    r.period shouldBe 60
    r.summaries.keySet shouldBe Set("BTC", "ETH")
    r.summaries("BTC").close.highest.get shouldBe 102.0
    r.errors shouldBe Map("DOGE" -> "No data found for this stock and period.")
  }
}

package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.model.Candle

class CandleReplaySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("toTopicFrames: per-symbol topic routing and the 7-field JSON shape") {
    val s = spark
    import s.implicits._
    val candles = Seq(
      Candle("BTCIRT", ts("2024-01-01 10:00:00"), 1, 2, 0.5, 1.5, 100),
      Candle("SHIBIRT", ts("2024-01-01 10:00:00"), 9, 9, 9, 9, 1)
    ).toDS()
    val rows = CandleReplay.toTopicFrames(candles).collect()
    val byKey = rows.map(r => r.getAs[String]("key") -> r).toMap
    byKey("BTCIRT").getAs[String]("topic") shouldBe "btcirt_topic"
    byKey("SHIBIRT").getAs[String]("topic") shouldBe "shibirt_topic"
    val v = byKey("BTCIRT").getAs[String]("value")
    // decode round-trips through the stream-side decoder (S3)
    val decoded = graft.streaming.StreamingIndicators
      .decodeCandleJson(Seq(v).toDF("value")).collect().head
    decoded shouldBe candles.collect().head
  }

  test("replayRange: store -> pruned range -> publishable frames") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_replay").toString + "/store"
    val candles = (1 to 3).flatMap(day => Seq(
      Candle("BTCIRT", ts(f"2024-01-0$day 10:00:00"), 1, 2, 0.5, 1.5, 100)))
    PartitionedStore.write(candles.toDF(), dir)
    val out = CandleReplay.replayRange(
      spark, dir, ts("2024-01-02 00:00:00"), ts("2024-01-02 23:59:59"))
    val rows = out.collect()
    rows should have length 1
    rows.head.getAs[String]("topic") shouldBe "btcirt_topic"
  }
}

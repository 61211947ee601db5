package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Candle
import graft.ops.Indicators

/** Property: for ordered on-time input, the O(1)-state streaming fold
  * ([[StreamingIndicators.step]]) and the batch Window pipeline
  * ([[Indicators.enrich]]) produce bit-identical enriched rows — on ANY
  * close series, including flat stretches (zero deltas -> null rs) and
  * sub-warm-up lengths.
  */
class StreamBatchPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // plain values plus deliberate repeat runs (flat stretches -> zero deltas)
  private val seriesGen: Gen[List[Double]] = for {
    n <- Gen.choose(0, 35)
    xs <- Gen.listOfN(n, Gen.oneOf(Gen.choose(1.0, 100.0), Gen.const(42.0)))
  } yield xs

  test("property: streaming fold == batch window pipeline on random series") {
    (1 to 15).foreach { i =>
      val closes = seriesGen(Gen.Parameters.default, Seed(i.toLong)).get
      val candles = closes.zipWithIndex.map { case (c, j) =>
        Candle("SYM",
          Timestamp.valueOf(f"2024-01-01 00:${j / 60}%02d:${j % 60}%02d"),
          c, c, c, c, 1.0)
      }

      // streaming fold
      val streamed = candles
        .foldLeft((StreamingIndicators.emptyState,
          Vector.empty[graft.model.EnrichedCandle])) { case ((st, acc), c) =>
          val (n, e) = StreamingIndicators.step(st, c)
          (n, acc :+ e)
        }._2

      // batch window pipeline
      val s = spark
      import s.implicits._
      val batch =
        if (candles.isEmpty) Array.empty[org.apache.spark.sql.Row]
        else Indicators
          .enrich(candles.toDF(), col("stock_symbol"), col("local_time"),
            col("close"))
          .orderBy("local_time")
          .collect()

      assert(batch.length == streamed.length, s"seed=$i")
      batch.zip(streamed).foreach { case (b, e) =>
        def o(name: String): Option[Double] =
          Option(b.getAs[Any](name)).map(_.asInstanceOf[Double])
        def bitEq(x: Option[Double], y: Option[Double], name: String): Unit =
          assert(
            x.map(java.lang.Double.doubleToLongBits) ==
              y.map(java.lang.Double.doubleToLongBits),
            s"seed=$i $name: batch=$x stream=$y at ${b.getAs[Timestamp]("local_time")}")
        bitEq(o("sma_5"), e.sma_5, "sma_5")
        bitEq(o("ema_10"), e.ema_10, "ema_10")
        bitEq(o("delta"), e.delta, "delta")
        bitEq(o("gain"), e.gain, "gain")
        bitEq(o("loss"), e.loss, "loss")
        bitEq(o("avg_gain_10"), e.avg_gain_10, "avg_gain_10")
        bitEq(o("avg_loss_10"), e.avg_loss_10, "avg_loss_10")
        bitEq(o("rs"), e.rs, "rs")
        bitEq(o("rsi_10"), e.rsi_10, "rsi_10")
        assert(b.getAs[String]("signal") == e.signal, s"seed=$i signal")
      }
    }
  }
}

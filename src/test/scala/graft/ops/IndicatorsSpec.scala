package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Reference implementation of the pandas semantics from
  * /root/reference/services/stream-processing/app/consumer.py:107-155,
  * written as straight-line Scala so the engine's window pipeline is tested
  * against an independent oracle.
  */
object PandasRef {
  case class Row(
      sma5: Option[Double], ema10: Option[Double], delta: Option[Double],
      gain: Option[Double], loss: Option[Double],
      avgGain10: Option[Double], avgLoss10: Option[Double],
      rs: Option[Double], rsi10: Option[Double], signal: String)

  def compute(closes: Seq[Double]): Seq[Row] = {
    val n = closes.length
    val alpha = 2.0 / 11.0
    val sma = closes.indices.map { i =>
      if (i >= 4) Some(closes.slice(i - 4, i + 1).sum / 5.0) else None
    }
    // adjust=False recursion, masked until 10 observations
    val emaRaw = closes.scanLeft(Option.empty[Double]) {
      case (None, x)    => Some(x)
      case (Some(e), x) => Some((1 - alpha) * e + alpha * x)
    }.tail
    val ema = closes.indices.map(i => if (i >= 9) emaRaw(i) else None)
    val delta = closes.indices.map(i =>
      if (i == 0) None else Some(closes(i) - closes(i - 1)))
    val gain = delta.map(_.map(d => math.max(d, 0.0)))
    val loss = delta.map(_.map(d => math.max(-d, 0.0)))
    def roll10(xs: Seq[Option[Double]], i: Int): Option[Double] = {
      val w = xs.slice(math.max(0, i - 9), i + 1).flatten
      if (w.length == 10) Some(w.sum / 10.0) else None
    }
    val ag = closes.indices.map(i => roll10(gain, i))
    val al = closes.indices.map(i => roll10(loss, i))
    val rs = closes.indices.map { i =>
      (ag(i), al(i)) match {
        case (Some(g), Some(l)) if l != 0.0 => Some(g / l)
        case _                              => None
      }
    }
    val rsi = rs.map(_.map(r => 100.0 - 100.0 / (1.0 + r)))
    val sig = closes.indices.map { i =>
      (sma(i), ema(i), rsi(i)) match {
        case (Some(s), Some(e), Some(r)) =>
          if (s > e && r < 70) "BUY"
          else if (s < e && r > 30) "SELL"
          else "HOLD"
        case _ => "HOLD"
      }
    }
    closes.indices.map(i =>
      Row(sma(i), ema(i), delta(i), gain(i), loss(i), ag(i), al(i), rs(i),
        rsi(i), sig(i)))
  }
}

class IndicatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Two symbols: one wavy (hits BUY/SELL), one with a flat stretch
    * (delta==0 -> rs null via zero denominator) and a monotone stretch
    * (avg_loss == 0).
    */
  private val wavy = Seq(
    10.0, 12.0, 11.0, 13.0, 12.5, 14.0, 13.0, 15.0, 14.5, 16.0,
    15.0, 17.0, 16.5, 18.0, 17.0, 16.0, 15.5, 14.0, 14.5, 13.0)
  private val flatThenUp = Seq(
    5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0,
    5.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0, 12.0, 13.0)

  private def run(bySym: Map[String, Seq[Double]]) = {
    val rows = bySym.toSeq.flatMap { case (sym, closes) =>
      closes.zipWithIndex.map { case (c, i) =>
        (sym, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), i.toLong, c)
      }
    }
    val df = rows.toDF("event_type", "ts", "event_id", "value")
    Indicators
      .enrich(df, col("event_type"), col("ts"), col("value"),
        Seq(col("event_id")))
      .orderBy("event_type", "ts")
      .collect()
      .groupBy(r => r.getAs[String]("event_type"))
  }

  private def checkSym(sym: String, closes: Seq[Double]): Unit = {
    val got = run(Map(sym -> closes))(sym)
    val exp = PandasRef.compute(closes)
    def o(v: Any): Option[Double] =
      Option(v).map(_.asInstanceOf[Double])
    got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      def cmp(name: String, a: Option[Double], b: Option[Double]): Unit = {
        assert(a.isDefined == b.isDefined, s"$sym[$i].$name null-ness: got $a want $b")
        for (x <- a; y <- b)
          assert(math.abs(x - y) < 1e-9, s"$sym[$i].$name: got $x want $y")
      }
      cmp("sma_5", o(g.getAs[Any]("sma_5")), e.sma5)
      cmp("ema_10", o(g.getAs[Any]("ema_10")), e.ema10)
      cmp("delta", o(g.getAs[Any]("delta")), e.delta)
      cmp("gain", o(g.getAs[Any]("gain")), e.gain)
      cmp("loss", o(g.getAs[Any]("loss")), e.loss)
      cmp("avg_gain_10", o(g.getAs[Any]("avg_gain_10")), e.avgGain10)
      cmp("avg_loss_10", o(g.getAs[Any]("avg_loss_10")), e.avgLoss10)
      cmp("rs", o(g.getAs[Any]("rs")), e.rs)
      cmp("rsi_10", o(g.getAs[Any]("rsi_10")), e.rsi10)
      assert(g.getAs[String]("signal") == e.signal, s"$sym[$i].signal")
    }
  }

  test("wavy series matches pandas-semantics reference (all 10 columns)") {
    checkSym("wavy", wavy)
  }

  test("flat stretch: zero denominator yields null rs, monotone avg_loss=0") {
    checkSym("flat", flatThenUp)
    val got = run(Map("flat" -> flatThenUp))("flat")
    // rows 10-11: all-zero gains/losses -> avg_loss_10 == 0 -> rs null -> HOLD
    val r11 = got(11)
    assert(r11.getAs[Any]("avg_loss_10") == 0.0)
    assert(r11.getAs[Any]("rs") == null)
    assert(r11.getAs[String]("signal") == "HOLD")
  }

  test("warm-up boundaries: sma at row 5, ema/rsi at rows 10/11") {
    val got = run(Map("wavy" -> wavy))("wavy")
    assert(got(3).getAs[Any]("sma_5") == null)
    assert(got(4).getAs[Any]("sma_5") != null)
    assert(got(8).getAs[Any]("ema_10") == null)
    assert(got(9).getAs[Any]("ema_10") != null)
    assert(got(9).getAs[Any]("avg_gain_10") == null) // first delta is null
    assert(got(10).getAs[Any]("avg_gain_10") != null)
  }

  test("multi-symbol run does not leak state across partitions") {
    val both = run(Map("wavy" -> wavy, "flat" -> flatThenUp))
    val expW = PandasRef.compute(wavy)
    val expF = PandasRef.compute(flatThenUp)
    assert(both("wavy").map(_.getAs[String]("signal")).toSeq == expW.map(_.signal))
    assert(both("flat").map(_.getAs[String]("signal")).toSeq == expF.map(_.signal))
  }

  test("signal truth table: null guard, crossover branches, tie -> HOLD") {
    val df = Seq(
      (Some(10.0), Some(9.0), Some(50.0), "BUY"), // sma>ema, rsi<70
      (Some(10.0), Some(9.0), Some(75.0), "HOLD"), // rsi too high for BUY
      (Some(9.0), Some(10.0), Some(50.0), "SELL"), // sma<ema, rsi>30
      (Some(9.0), Some(10.0), Some(25.0), "HOLD"), // rsi too low for SELL
      (Some(10.0), Some(10.0), Some(50.0), "HOLD"), // tie
      (None, Some(10.0), Some(50.0), "HOLD"), // null sma
      (Some(10.0), None, Some(50.0), "HOLD"), // null ema
      (Some(10.0), Some(9.0), None, "HOLD") // null rsi
    ).toDF("sma", "ema", "rsi", "expected")
    val got = df
      .withColumn("signal",
        Indicators.signalExpr(col("sma"), col("ema"), col("rsi")))
      .collect()
    got.foreach(r =>
      assert(r.getAs[String]("signal") == r.getAs[String]("expected"),
        r.toString))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

import graft.functions.EwmAvg.ewmAvg

/** The reference's analytical core (SURVEY.md §2.4/§2.5): per-symbol ordered
  * time-series indicators + trade signal, re-expressed as pure Catalyst
  * window/column expressions (no UDFs, no driver-side collect).
  *
  * Reference semantics (pandas, /root/reference/services/stream-processing/
  * app/consumer.py:107-155):
  *   - SMA_5    = close.rolling(5).mean()                 (T2)
  *   - EMA_10   = close.ewm(span=10, adjust=False, min_periods=10).mean() (T3)
  *   - delta    = close.diff()                            (T4)
  *   - gain     = delta.clip(lower=0); loss = -delta.clip(upper=0) (T5)
  *   - avg_gain_10/avg_loss_10 = gain.rolling(10).mean()  (T6; note the
  *     first delta is null, so these first fire at row 11 — gate on
  *     NON-NULL COUNT in the frame, not on row number)
  *   - rs       = avg_gain_10 / avg_loss_10, zero denominator -> null (T7)
  *   - RSI_10   = 100 - 100/(1+rs)                        (T8)
  *   - signal   = BUY/SELL/HOLD crossover rule with null guard (C1,
  *     consumer.py:131-155)
  *
  * Everything is a single window stage over one hash-partitioning by the
  * symbol column: at cluster scale this is ONE shuffle, then each partition
  * streams in time order (sort happens within partitions). O(1) state per
  * row for EMA via the custom [[graft.functions.EwmAvg]] window function.
  */
object Indicators {

  /** All indicator columns appended to `df`.
    *
    * @param symbol   partition key column (e.g. stock symbol)
    * @param time     ordering column
    * @param close    value column the indicators are computed over
    * @param tieBreak extra ordering column to make results deterministic
    *                 when `time` has duplicates
    */
  def enrich(
      df: DataFrame,
      symbol: Column,
      time: Column,
      close: Column,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val w: WindowSpec = Window.partitionBy(symbol).orderBy(time +: tieBreak: _*)
    val last5 = w.rowsBetween(-4, 0)
    val last10 = w.rowsBetween(-9, 0)

    // rolling(5).mean(): null until 5 non-null closes in frame
    val sma5 =
      when(count(close).over(last5) === 5, avg(close).over(last5))

    val delta = close - lag(close, 1).over(w)
    val gain = when(delta.isNotNull, greatest(delta, lit(0.0)))
    val loss = when(delta.isNotNull, greatest(-delta, lit(0.0)))

    def avg10(c: Column): Column =
      when(count(c).over(last10) === 10, avg(c).over(last10))

    val df1 = df
      .withColumn("sma_5", sma5)
      .withColumn("ema_10", ewmAvg(close, span = 10).over(w))
      .withColumn("delta", delta)
      .withColumn("gain", gain)
      .withColumn("loss", loss)
    // second stage: rolling means over the derived gain/loss columns
    val df2 = df1
      .withColumn("avg_gain_10", avg10(col("gain")))
      .withColumn("avg_loss_10", avg10(col("loss")))
    val rs = col("avg_gain_10") / when(col("avg_loss_10") =!= 0.0, col("avg_loss_10"))
    df2
      .withColumn("rs", rs)
      .withColumn("rsi_10", lit(100.0) - lit(100.0) / (lit(1.0) + col("rs")))
      .withColumn("signal", signalExpr(col("sma_5"), col("ema_10"), col("rsi_10")))
  }

  /** Scenario-B crossover signal (consumer.py:131-155): any null indicator ->
    * HOLD; SMA>EMA and RSI<70 -> BUY; SMA<EMA and RSI>30 -> SELL; else HOLD
    * (tie SMA==EMA -> HOLD).
    */
  def signalExpr(sma: Column, ema: Column, rsi: Column): Column =
    when(rsi.isNull || sma.isNull || ema.isNull, lit("HOLD"))
      .when(sma > ema && rsi < 70.0, lit("BUY"))
      .when(sma < ema && rsi > 30.0, lit("SELL"))
      .otherwise(lit("HOLD"))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

import graft.functions.EwmAvg.ewmAvg

/** Reusable technical-indicator library over any (symbol, time, value)
  * frame — the composable surface behind [[graft.queries.TechQueries]].
  * Same plan shape as [[Indicators.enrich]]: ONE shuffle on the symbol
  * key, O(1)-per-row running/rolling frames, no UDFs.
  *
  * All methods append columns and leave the input columns untouched, so
  * they chain: `macd(bollinger(df, ...), ...)`.
  */
object TechIndicators {

  private def w(symbol: Column, time: Column, tieBreak: Seq[Column]): WindowSpec =
    Window.partitionBy(symbol).orderBy(time +: tieBreak: _*)

  /** MACD(fast, slow, signal): twice-cascaded recursive EMA. Appends
    * ema_<fast>, ema_<slow>, macd, macd_signal, macd_hist.
    */
  def macd(
      df: DataFrame,
      symbol: Column,
      time: Column,
      close: Column,
      tieBreak: Seq[Column] = Nil,
      fast: Int = 12,
      slow: Int = 26,
      signal: Int = 9): DataFrame = {
    val wo = w(symbol, time, tieBreak)
    df.withColumn(s"ema_$fast", ewmAvg(close, span = fast).over(wo))
      .withColumn(s"ema_$slow", ewmAvg(close, span = slow).over(wo))
      .withColumn("macd", col(s"ema_$fast") - col(s"ema_$slow"))
      .withColumn("macd_signal", ewmAvg(col("macd"), span = signal).over(wo))
      .withColumn("macd_hist", col("macd") - col("macd_signal"))
  }

  /** Bollinger(n, k): rolling mean +- k sigma via the avg-of-squares
    * identity (keeps both engines on plain windowed avg). Appends bb_mid,
    * bb_sd, bb_upper, bb_lower, pct_b.
    */
  def bollinger(
      df: DataFrame,
      symbol: Column,
      time: Column,
      close: Column,
      tieBreak: Seq[Column] = Nil,
      n: Int = 20,
      k: Double = 2.0): DataFrame = {
    val wn = w(symbol, time, tieBreak).rowsBetween(-(n - 1), 0)
    val full = count(close).over(wn) === n
    // moments from EXACT integer window sums of 1e-2-quantized ticks
    // (round-to-nearest recovers the price grid losslessly; |close| < 9e4
    // keeps sum(q^2) under 2^53). A windowed avg of raw doubles is
    // summation-ORDER-dependent — Spark's sliding accumulator and
    // DuckDB's recompute disagree by an ulp, which the sd's
    // cancellation then amplifies across the 9-decimal compare boundary
    // (observed at sf0.1). Integer sums are order-free, so every
    // downstream double op is bit-identical cross-engine.
    df.withColumn("__q", floor(close * lit(1e2) + lit(0.5)).cast("long"))
      .withColumn("bb_mid", when(full,
        sum(col("__q")).over(wn).cast("double") / lit(1e2) / lit(n.toDouble)))
      .withColumn("__m2", when(full,
        sum(col("__q") * col("__q")).over(wn).cast("double") / lit(1e4) / lit(n.toDouble)))
      .withColumn("bb_sd",
        sqrt(greatest(col("__m2") - col("bb_mid") * col("bb_mid"), lit(0.0))))
      .withColumn("bb_upper", col("bb_mid") + lit(k) * col("bb_sd"))
      .withColumn("bb_lower", col("bb_mid") - lit(k) * col("bb_sd"))
      .withColumn("pct_b",
        (close - col("bb_lower")) /
          when(col("bb_sd") =!= 0.0, lit(2 * k) * col("bb_sd")))
      .drop("__m2", "__q")
  }

  /** Stochastic oscillator (n, d): %K from exact rolling min/max, %D a
    * rolling mean of %K. Appends lo_<n>, hi_<n>, pct_k, pct_d.
    */
  def stochastic(
      df: DataFrame,
      symbol: Column,
      time: Column,
      close: Column,
      tieBreak: Seq[Column] = Nil,
      n: Int = 14,
      dSmooth: Int = 3): DataFrame = {
    val wn = w(symbol, time, tieBreak).rowsBetween(-(n - 1), 0)
    val wd = w(symbol, time, tieBreak).rowsBetween(-(dSmooth - 1), 0)
    val fullN = count(close).over(wn) === n
    df.withColumn(s"lo_$n", when(fullN, min(close).over(wn)))
      .withColumn(s"hi_$n", when(fullN, max(close).over(wn)))
      .withColumn("pct_k",
        lit(100.0) * (close - col(s"lo_$n")) /
          when(col(s"hi_$n") =!= col(s"lo_$n"), col(s"hi_$n") - col(s"lo_$n")))
      .withColumn("pct_d",
        when(count(col("pct_k")).over(wd) === dSmooth,
          avg(col("pct_k")).over(wd)))
  }

  /** Running-peak drawdown (exact: max is order-free). Appends peak,
    * drawdown.
    */
  def drawdown(
      df: DataFrame,
      symbol: Column,
      time: Column,
      close: Column,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val wu = w(symbol, time, tieBreak)
      .rowsBetween(Window.unboundedPreceding, 0)
    val peak = max(close).over(wu)
    df.withColumn("peak", peak)
      .withColumn("drawdown",
        (close - col("peak")) / when(col("peak") =!= 0.0, col("peak")))
  }
}

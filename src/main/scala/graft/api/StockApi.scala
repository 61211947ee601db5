package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.Num

/** Scala parity surface for the reference's REST layer
  * (/root/reference/services/aggregator_django/aggregator/views.py,
  * urls.py:6-10): the three endpoint shapes re-expressed as typed functions
  * over a `stock_data`-shaped DataFrame (output of
  * [[graft.ops.Indicators.enrich]] or the streaming pipeline).
  *
  * Semantics preserved:
  *   - closed time interval `[now - period minutes, now]` (views.py:26-31);
  *   - 17-column field whitelist (serializers.py:3-7) — case-insensitive
  *     here since our canonical column names are lower_snake;
  *   - the empty-range behavior: aggregates over zero rows yield an
  *     all-null summary (what the reference's SQL actually returns), and
  *     `summarizeMultiple` records "No data found for this stock and
  *     period." per empty symbol (views.py:287-289);
  *   - `summarizeMultiple` runs as ONE groupBy pass over all symbols
  *     instead of the reference's per-symbol query loop (views.py:281-289)
  *     — same results, one scan, one shuffle.
  *
  * `now` is an explicit parameter (the reference uses Tehran wall-clock at
  * request time, views.py:197-210 — a concern of the HTTP edge, not the
  * engine).
  */
object StockApi {

  /** serializers.py:3-7, normalized to our lower_snake column names. */
  val ValidFields: Set[String] = Set(
    "stock_symbol", "signal", "local_time", "open", "close", "high", "low",
    "volume", "sma_5", "ema_10", "delta", "gain", "loss", "avg_gain_10",
    "avg_loss_10", "rs", "rsi_10")

  final case class AggResult(
      aggregation: String,
      value: Option[Double],
      field: String,
      stockSymbol: String)

  final case class Stat(
      avg: Option[Double], highest: Option[Double], lowest: Option[Double])

  final case class GainLoss(
      highestGain: Option[Double], highestLoss: Option[Double])

  /** build_single_summary_response shape (views.py:88-114). */
  final case class StockSummary(
      close: Stat, sma5: Stat, ema10: Stat, rsi10: Stat, gainLoss: GainLoss)

  final case class SingleSummaryResponse(
      stockSymbol: String, period: Int, summary: StockSummary)

  /** /api/summarize/multiple/ response (views.py:299-303). */
  final case class MultiSummaryResponse(
      period: Int,
      summaries: Map[String, StockSummary],
      errors: Map[String, String])

  private def normalizeField(field: String): String = {
    val f = field.toLowerCase
    require(ValidFields(f), s"field '$field' not in the whitelist")
    f
  }

  private def inRange(now: Timestamp, periodMinutes: Int): Column = {
    val start = Timestamp.from(now.toInstant.minusSeconds(periodMinutes * 60L))
    col("local_time").between(lit(start), lit(now))
  }

  /** POST /api/aggregate/ — avg | highest | lowest of one whitelisted field
    * over (symbol, closed period) (views.py:117-177).
    */
  def aggregate(
      stockData: DataFrame,
      aggregation: String,
      stockSymbol: String,
      periodMinutes: Int,
      field: String,
      now: Timestamp): AggResult = {
    val f = normalizeField(field)
    val aggCol = aggregation match {
      // cast first: the whitelist admits timestamp/string fields, where a
      // bare davg would fail analysis (timestamp) — cast averages the
      // timestamp as epoch seconds and yields null for strings, matching
      // the permissive SQL the reference issues (views.py:26-35)
      case "avg"     => Num.davg(col(f).cast("double"))
      case "highest" => max(col(f))
      case "lowest"  => min(col(f))
      case other =>
        throw new IllegalArgumentException(s"Invalid aggregation type: $other")
    }
    val row = stockData
      .filter(col("stock_symbol") === stockSymbol && inRange(now, periodMinutes))
      .agg(aggCol.cast("double").as("v"))
      .collect()
      .head
    AggResult(aggregation, Option(row.getAs[Any]("v")).map(_.asInstanceOf[Double]),
      f, stockSymbol)
  }

  private val summaryAggs: Seq[Column] = graft.queries.SummaryAggs.cols(
    col("close"), col("sma_5"), col("ema_10"), col("rsi_10"),
    col("gain"), col("loss"))

  private def rowToSummary(r: org.apache.spark.sql.Row): StockSummary = {
    def o(name: String): Option[Double] =
      Option(r.getAs[Any](name)).map(_.asInstanceOf[Double])
    StockSummary(
      close = Stat(o("avg_close"), o("max_close"), o("min_close")),
      sma5 = Stat(o("avg_sma_5"), o("max_sma_5"), o("min_sma_5")),
      ema10 = Stat(o("avg_ema_10"), o("max_ema_10"), o("min_ema_10")),
      rsi10 = Stat(o("avg_rsi_10"), o("max_rsi_10"), o("min_rsi_10")),
      gainLoss = GainLoss(o("max_gain"), o("max_loss")))
  }

  /** POST /api/summarize/ — 14-aggregate summary (views.py:179-237). */
  def summarize(
      stockData: DataFrame,
      stockSymbol: String,
      periodMinutes: Int,
      now: Timestamp): SingleSummaryResponse = {
    val row = stockData
      .filter(col("stock_symbol") === stockSymbol && inRange(now, periodMinutes))
      .agg(summaryAggs.head, summaryAggs.tail: _*)
      .collect()
      .head
    SingleSummaryResponse(stockSymbol, periodMinutes, rowToSummary(row))
  }

  /** POST /api/summarize/multiple/ — the reference loops one SQL query per
    * symbol (views.py:281-289); here it is one distributed groupBy pass.
    */
  def summarizeMultiple(
      stockData: DataFrame,
      stockSymbols: Seq[String],
      periodMinutes: Int,
      now: Timestamp): MultiSummaryResponse = {
    val rows = stockData
      .filter(col("stock_symbol").isin(stockSymbols: _*) &&
        inRange(now, periodMinutes))
      .groupBy(col("stock_symbol"))
      .agg(summaryAggs.head, summaryAggs.tail: _*)
      .collect()
    val summaries =
      rows.map(r => r.getAs[String]("stock_symbol") -> rowToSummary(r)).toMap
    val errors = stockSymbols
      .filterNot(summaries.contains)
      .map(_ -> "No data found for this stock and period.")
      .toMap
    MultiSummaryResponse(periodMinutes, summaries, errors)
  }
}

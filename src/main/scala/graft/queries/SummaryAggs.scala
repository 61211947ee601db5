package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{max, min}

/** The reference's 14-aggregate stock summary
  * (/root/reference/services/aggregator_django/aggregator/views.py:61-86),
  * shared by the verified query surface ([[FinanceQueries]] `q_summary`)
  * and the typed REST parity layer (`graft.api.StockApi`) so the two
  * cannot drift.
  */
object SummaryAggs {

  import Num.davg

  def cols(
      close: Column,
      sma5: Column,
      ema10: Column,
      rsi10: Column,
      gain: Column,
      loss: Column): Seq[Column] = Seq(
    davg(close).as("avg_close"),
    max(close).as("max_close"),
    min(close).as("min_close"),
    davg(sma5).as("avg_sma_5"),
    max(sma5).as("max_sma_5"),
    min(sma5).as("min_sma_5"),
    davg(ema10).as("avg_ema_10"),
    max(ema10).as("max_ema_10"),
    min(ema10).as("min_ema_10"),
    davg(rsi10).as("avg_rsi_10"),
    max(rsi10).as("max_rsi_10"),
    min(rsi10).as("min_rsi_10"),
    max(gain).as("max_gain"),
    max(loss).as("max_loss"))
}

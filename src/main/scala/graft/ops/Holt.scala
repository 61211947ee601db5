package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Holt linear-trend (double exponential) smoothing per series, in exact
  * integer fixed point — the classical level+trend forecaster next to
  * the reference's LSTM roll-forward (the reference forecasts close
  * prices from a lookback window, AI-LSTM/LSTM_Stock_Market_Prediction.py:41-54;
  * Holt is the closed-form baseline every forecasting bake-off starts
  * with, and its data plane — one ordered pass per series — is exactly
  * the indicator-core shape).
  *
  * Recurrence (alpha = 2/10, beta = 1/10, prices in integer cents):
  * {{{
  *   l_1 = p_1, b_1 = 0
  *   l_t = (2 p_t + 8 (l_(t-1) + b_(t-1))) tdiv 10
  *   b_t = ((l_t - l_(t-1)) + 9 b_(t-1))   tdiv 10
  * }}}
  * with tdiv = truncate-toward-zero division (JVM `/`). DuckDB `//`
  * also truncates toward zero (verified: `(-7)//2 = -3`), but the
  * oracle spells it sign * abs-div anyway — the [[PcaPower]] convention:
  * defense in depth against either engine changing its negative-operand
  * division convention, not a floor-semantics workaround. Every quantity
  * is int64, so the fold is bit-identical at any parallelism and the
  * oracle replays it as a recursive CTE.
  *
  * Scale shape: ONE shuffle on the series key, then an O(1)-state
  * ordered fold inside each group (`flatMapSortedGroups` — Spark sorts
  * within groups, no driver involvement). Identical cost profile to the
  * [[Indicators]] window core; the typed fold is used (rather than a
  * window function) because an integer-division recurrence has no
  * associative reformulation for a Catalyst window — the same boundary
  * [[graft.functions.EwmAvg]] documents from the float side.
  */
object Holt {

  /** Internal fold row (public: Catalyst's generated deserializer cannot
    * access a private case class).
    */
  case class Ev(
      symbol: String, ord: Long, tie: Long, event_id: Long, p: Long)

  /** Smooth `df` (columns: symbol, ts, event_id, value). Output:
    * (event_id, p_fp, l_fp, b_fp, forecast_fp) with forecast_fp the
    * one-step-ahead level+trend forecast, all in integer cents.
    */
  def smooth(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("symbol"),
        // µs-exact ordering key: a seconds cast would collapse same-second
        // ties and diverge from the oracle's ORDER BY ts
        expr("unix_micros(ts)").as("ord"),
        col("event_id").as("tie"),
        col("event_id"),
        expr("CAST(floor(value * 1e2 + 5e-1) AS BIGINT)").as("p"))
      .as[Ev]
      .groupByKey(_.symbol)
      .flatMapSortedGroups($"ord", $"tie") { (_, it) =>
        var l = 0L
        var b = 0L
        var first = true
        it.map { e =>
          if (first) { l = e.p; b = 0L; first = false }
          else {
            val lprev = l
            l = (2 * e.p + 8 * (l + b)) / 10
            b = ((l - lprev) + 9 * b) / 10
          }
          (e.event_id, e.p, l, b, l + b)
        }
      }
      .toDF("event_id", "p_fp", "l_fp", "b_fp", "forecast_fp")
  }

  /** The identical recurrence as a DuckDB recursive CTE over a
    * `graft_series` (symbol, ts, event_id, value) relation — the oracle
    * twin of [[smooth]] (lateral aliases keep the level update single-
    * sourced inside each step).
    */
  def oracleSql: String =
    oracleCtes + "\nSELECT event_id, p AS p_fp, l AS l_fp, b AS b_fp,\n" +
      "  l + b AS forecast_fp\nFROM holt"

  /** The CTE chain only (ends defining `holt` (symbol, rn, event_id,
    * p, l, b)) — so downstream oracles (forecast evaluation) can chain
    * onto the recurrence in one statement.
    */
  def oracleCtes: String =
    """ev AS MATERIALIZED (
      |  SELECT symbol, event_id,
      |    row_number() OVER (PARTITION BY symbol ORDER BY ts, event_id) AS rn,
      |    CAST(floor(value * 1e2 + 5e-1) AS BIGINT) AS p
      |  FROM graft_series
      |), holt(symbol, rn, event_id, p, l, b) AS (
      |  SELECT symbol, rn, event_id, p, p, CAST(0 AS BIGINT)
      |  FROM ev WHERE rn = 1
      |  UNION ALL
      |  SELECT ev.symbol, ev.rn, ev.event_id, ev.p,
      |    (CASE WHEN (2 * ev.p + 8 * (holt.l + holt.b)) < 0
      |          THEN -((-(2 * ev.p + 8 * (holt.l + holt.b))) // 10)
      |          ELSE (2 * ev.p + 8 * (holt.l + holt.b)) // 10 END) AS lnew,
      |    (CASE WHEN ((lnew - holt.l) + 9 * holt.b) < 0
      |          THEN -((-((lnew - holt.l) + 9 * holt.b)) // 10)
      |          ELSE ((lnew - holt.l) + 9 * holt.b) // 10 END)
      |  FROM holt JOIN ev ON ev.symbol = holt.symbol AND ev.rn = holt.rn + 1
      |)""".stripMargin
}

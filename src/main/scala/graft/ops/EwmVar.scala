package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RiskMetrics EWMA variance (J.P. Morgan's λ = 0.94 volatility
  * estimator) per series, in exact integer fixed point — the
  * volatility-tracking member of the forecasting tier ([[Holt]] tracks
  * level, this tracks DISPERSION; q_sharpe's global variance is the
  * static cousin):
  * {{{
  *   v_1 = r_1²
  *   v_t = (94 v_(t-1) + 6 r_t²) tdiv 100
  * }}}
  * over the q_sharpe return convention (winsorized ±100% ratio returns
  * on 1e6 fp, sub-$1 previous closes excluded — the synthetic feed is
  * not a random walk, NOTES.md round-5). Headroom: r² ≤ 1e12 so
  * 94·v ≤ 9.4e13, deep inside int64. vol_fp = floor(sqrt(v)) rides on
  * sqrt being correctly rounded under IEEE-754 on BOTH engines (unlike
  * ln — the reason this is safe where a UCB ln bonus was not).
  *
  * Scale shape: one lag window + one O(1)-state ordered fold per
  * series (the [[Holt]] plane); oracle = recursive CTE.
  */
object EwmVar {

  /** Fold row (public for the Catalyst deserializer). */
  case class Rv(symbol: String, rn: Long, r_fp: Long)

  /** Track over a returns frame (symbol, rn, r_fp) — rn must be the
    * 1-based position within each series. Output: (symbol, rn, r_fp,
    * var_fp, vol_fp).
    */
  def track(returns: DataFrame): DataFrame = {
    val spark = returns.sparkSession
    import spark.implicits._
    returns.as[Rv]
      .groupByKey(_.symbol)
      .flatMapSortedGroups($"rn") { (_, it) =>
        var v = 0L
        var first = true
        it.map { e =>
          v = if (first) { first = false; e.r_fp * e.r_fp }
            else (94 * v + 6 * e.r_fp * e.r_fp) / 100
          (e.symbol, e.rn, e.r_fp, v,
            math.floor(math.sqrt(v.toDouble)).toLong)
        }
      }
      .toDF("symbol", "rn", "r_fp", "var_fp", "vol_fp")
  }

  /** The identical recurrence as a DuckDB recursive CTE over a
    * `graft_returns` (symbol, rn, r_fp) relation.
    */
  def oracleSql: String =
    """ewv(symbol, rn, r_fp, v) AS (
      |  SELECT symbol, rn, r_fp, r_fp * r_fp
      |  FROM graft_returns WHERE rn = 1
      |  UNION ALL
      |  SELECT e.symbol, e.rn, e.r_fp,
      |    (94 * ewv.v + 6 * e.r_fp * e.r_fp) // 100
      |  FROM ewv JOIN graft_returns e
      |    ON e.symbol = ewv.symbol AND e.rn = ewv.rn + 1
      |)
      |SELECT symbol, rn, r_fp, v AS var_fp,
      |  CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) AS vol_fp
      |FROM ewv""".stripMargin
}

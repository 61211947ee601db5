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

  /** The identical recurrence as a BLOCK-folded DuckDB query over a
    * `graft_returns` (symbol, rn, r_fp) relation (rn contiguous
    * 1-based per symbol). A naive per-rn recursive CTE is serial in n
    * AND rescans the returns table every iteration — an sf1 oracle
    * timeout (NOTES round-5). This form splits each series into
    * 64-row blocks:
    *
    *  - `carry` recursion runs over BLOCKS (n/64 iterations), each
    *    advancing the variance across a whole block with one scalar
    *    `list_reduce` fold (the carry seed rides in via
    *    `list_prepend`; block 0 seeds v₁ = r₁²);
    *  - per-row values are then independent prefix folds WITHIN the
    *    row's block (≤ 64 lambda steps each, embarrassingly parallel).
    *
    * Cost ≈ n²/(symbols·64²) join work + 64·n lambda steps — ~14 s at
    * the 1M-row sf1 shape vs a timeout before; equivalence with the
    * serial recursion is exact (same integer ops in the same order).
    */
  def oracleSql: String =
    """blocks AS MATERIALIZED (
      |  SELECT symbol, CAST((rn - 1) // 64 AS BIGINT) AS blk,
      |    list(r_fp ORDER BY rn) AS rs
      |  FROM graft_returns GROUP BY 1, 2
      |),
      |carry(symbol, blk, vin) AS (
      |  SELECT symbol, CAST(0 AS BIGINT) AS blk, CAST(NULL AS BIGINT) AS vin
      |  FROM blocks WHERE blk = 0
      |  UNION ALL
      |  SELECT b.symbol, b.blk + 1,
      |    CASE WHEN carry.vin IS NULL THEN
      |      list_reduce(list_prepend(b.rs[1] * b.rs[1], b.rs[2:]),
      |        (acc, r) -> (94 * acc + 6 * r * r) // 100)
      |    ELSE
      |      list_reduce(list_prepend(carry.vin, b.rs),
      |        (acc, r) -> (94 * acc + 6 * r * r) // 100)
      |    END
      |  FROM carry JOIN blocks b
      |    ON b.symbol = carry.symbol AND b.blk = carry.blk
      |),
      |ewv AS (
      |  SELECT g.symbol, g.rn, g.r_fp,
      |    CASE WHEN c.vin IS NULL THEN
      |      CASE WHEN ((g.rn - 1) % 64) = 0 THEN g.r_fp * g.r_fp
      |      ELSE list_reduce(
      |        list_prepend(b.rs[1] * b.rs[1], b.rs[2:((g.rn - 1) % 64) + 1]),
      |        (acc, r) -> (94 * acc + 6 * r * r) // 100) END
      |    ELSE list_reduce(
      |      list_prepend(c.vin, b.rs[1:((g.rn - 1) % 64) + 1]),
      |      (acc, r) -> (94 * acc + 6 * r * r) // 100) END AS v
      |  FROM graft_returns g
      |  JOIN blocks b ON b.symbol = g.symbol AND b.blk = (g.rn - 1) // 64
      |  JOIN carry c ON c.symbol = g.symbol AND c.blk = b.blk
      |)
      |SELECT symbol, rn, r_fp, v AS var_fp,
      |  CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) AS vol_fp
      |FROM ewv""".stripMargin
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar Kalman filter (local-level model) per series with the FULL
  * time-varying gain, in exact integer fixed point — the state-space
  * smoother between [[graft.functions.EwmAvg]] (a Kalman whose gain has
  * already converged: the steady state of THIS filter is exactly an
  * EWMA) and [[Holt]] (level+trend but fixed gains). The time-varying
  * gain is what the fixed-gain ops cannot express: early observations
  * move the estimate almost 1:1 while the variance is wide, then the
  * gain anneals toward its fixed point — the standard burn-in-free
  * smoother for sensor/price streams.
  *
  * Model: x_t = x_(t-1) + w (Var Q), z_t = x_t + v (Var R), prices in
  * integer cents, Q = 25, R = 10000 cents², gain in 1e6 fixed point:
  * {{{
  *   x_1 = p_1, P_1 = R
  *   Pp  = P + Q
  *   k   = (Pp * 1e6)  div (Pp + R)          -- gain, in [0, 1e6)
  *   x'  = x + (k * (p - x)) tdiv 1e6
  *   P'  = ((1e6 - k) * Pp) div 1e6
  * }}}
  * with tdiv = truncate-toward-zero (JVM `/`; the oracle spells
  * sign·abs-div — the [[PcaPower]] defense-in-depth convention). P
  * anneals monotonically from R to its fixed point P∞ ≈ 488 (k∞ ≈
  * 0.049), every quantity is int64 (|p−x| ≤ price range ≤ ~5e6 cents,
  * k·(p−x) ≤ 5e12; P ≤ R+Q so k and P' products stay ≤ ~1e10), so the
  * fold is bit-identical at any parallelism and the oracle replays it
  * as a recursive CTE.
  *
  * Scale shape: ONE shuffle on the series key + an O(1)-state ordered
  * fold per group (`flatMapSortedGroups`) — the [[Holt]] cost profile;
  * the recurrence divides per step, so no associative window
  * reformulation exists (the EwmAvg boundary note).
  */
object Kalman {

  val Q = 25L
  val R = 10000L
  val S = 1000000L

  /** Fold row (public: Catalyst's deserializer cannot access a private
    * case class).
    */
  case class Ev(
      symbol: String, ord: Long, tie: Long, event_id: Long, p: Long)

  /** Filter `df` (columns: symbol, ts, event_id, value). Output:
    * (event_id, p_fp, x_fp, pvar_fp, k_fp): measurement, posterior
    * state estimate, posterior variance, gain used (0 on the first
    * row, which initializes).
    */
  def filter(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("symbol"),
        expr("unix_micros(ts)").as("ord"),
        col("event_id").as("tie"),
        col("event_id"),
        expr("CAST(floor(value * 1e2 + 5e-1) AS BIGINT)").as("p"))
      .as[Ev]
      .groupByKey(_.symbol)
      .flatMapSortedGroups($"ord", $"tie") { (_, it) =>
        var x = 0L
        var pv = 0L
        var first = true
        it.map { e =>
          var k = 0L
          if (first) { x = e.p; pv = R; first = false }
          else {
            val pp = pv + Q
            k = (pp * S) / (pp + R)
            x = x + (k * (e.p - x)) / S
            pv = ((S - k) * pp) / S
          }
          (e.event_id, e.p, x, pv, k)
        }
      }
      .toDF("event_id", "p_fp", "x_fp", "pvar_fp", "k_fp")
  }

  /** The identical recurrence as a DuckDB recursive CTE over a
    * `graft_series` (symbol, ts, event_id, value) relation.
    */
  def oracleSql: String =
    s"""ev AS MATERIALIZED (
       |  SELECT symbol, event_id,
       |    row_number() OVER (PARTITION BY symbol ORDER BY ts, event_id) AS rn,
       |    CAST(floor(value * 1e2 + 5e-1) AS BIGINT) AS p
       |  FROM graft_series
       |), kal(symbol, rn, event_id, p, k, x, pv) AS (
       |  SELECT symbol, rn, event_id, p, CAST(0 AS BIGINT), p,
       |    CAST($R AS BIGINT)
       |  FROM ev WHERE rn = 1
       |  UNION ALL
       |  SELECT ev.symbol, ev.rn, ev.event_id, ev.p,
       |    ((kal.pv + $Q) * $S) // (kal.pv + $Q + $R) AS knew,
       |    kal.x + (CASE WHEN knew * (ev.p - kal.x) < 0
       |        THEN -((-(knew * (ev.p - kal.x))) // $S)
       |        ELSE (knew * (ev.p - kal.x)) // $S END),
       |    (($S - knew) * (kal.pv + $Q)) // $S
       |  FROM kal JOIN ev ON ev.symbol = kal.symbol AND ev.rn = kal.rn + 1
       |)
       |SELECT event_id, p AS p_fp, x AS x_fp, pv AS pvar_fp, k AS k_fp
       |FROM kal""".stripMargin
}

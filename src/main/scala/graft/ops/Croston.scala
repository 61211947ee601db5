package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Croston's method for intermittent demand (Croston 1972), in exact
  * integer fixed point — the forecasting primitive for sparse series
  * (most periods zero: spare parts, long-tail SKUs, rare query terms),
  * where plain exponential smoothing decays toward zero between demands
  * and then over-reacts on arrival. Croston instead smooths two series
  * sampled only AT demand points: the demand size `z` and the
  * inter-arrival interval `p`; the per-period rate forecast is `z / p`.
  *
  * Recurrence (alpha = 1/4, sizes scaled by S = 1e4, k indexes demand
  * events of one series, `I_k` = periods since the previous demand,
  * `I_1` = 1 by convention):
  *
  * {{{
  *   z_1 = q_1 * S                    p_1 = I_1 * S
  *   z_k = (q_k * S + 3 z_(k-1)) tdiv 4
  *   p_k = (I_k * S + 3 p_(k-1)) tdiv 4
  *   f_k = (z_k * 1e6) tdiv p_k       -- rate per period, scale 1e6
  * }}}
  *
  * Every quantity is a positive int64 (q >= 1, I >= 1 imply z >= S/4^k
  * decays but stays >= 1, and p >= 2500 > 0 by induction), so plain
  * truncating division is exact and sign-free on both engines and the
  * fold is bit-identical at any parallelism. Headroom: z is bounded by
  * max(q)*S by induction (the update is a convex combination before
  * truncation), so the forecast numerator needs `max(q) * S * 1e6 <
  * 2^63` — S = 1e4 admits demands to ~9e8 units per period (2^63 /
  * 1e10); intervals bounded by the series span in periods.
  *
  * Scale shape ([[Holt]]): ONE shuffle on the series key, then an
  * O(1)-state ordered fold per group (`flatMapSortedGroups`) — no
  * driver involvement, no window over the full series. The typed fold
  * is used because a truncating-division recurrence has no associative
  * window reformulation (the [[graft.functions.EwmAvg]] boundary).
  */
object Croston {

  val S = 10000L

  /** Internal fold row (public: Catalyst's generated deserializer cannot
    * access a private case class).
    */
  case class Dm(series: Long, dd: Long, q: Long)

  /** Run Croston over `df` (columns: series, dd = period index as an
    * integer (e.g. epoch days), q = positive integer demand in that
    * period; one row per (series, period) with q > 0). Output:
    * (series, rn, q, gap_d, z_fp, p_fp, f_fp) — one row per demand
    * event, rn the 1-based event index within its series.
    */
  def forecast(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("series"), col("dd").cast("long").as("dd"),
        col("q").cast("long").as("q"))
      .as[Dm]
      .groupByKey(_.series)
      .flatMapSortedGroups($"dd") { (sid, it) =>
        var z = 0L
        var p = 0L
        var prev = Long.MinValue
        var rn = 0L
        it.map { e =>
          rn += 1
          val gap = if (rn == 1) 1L else e.dd - prev
          prev = e.dd
          if (rn == 1) { z = e.q * S; p = gap * S }
          else {
            z = (e.q * S + 3 * z) / 4
            p = (gap * S + 3 * p) / 4
          }
          (sid, rn, e.q, gap, z, p, z * 1000000L / p)
        }
      }
      .toDF("series", "rn", "q", "gap_d", "z_fp", "p_fp", "f_fp")
  }

  /** The identical recurrence as a DuckDB recursive CTE over a
    * `graft_demand` (series, dd, q) relation — the oracle twin of
    * [[forecast]]. Ends selecting (series, rn, q, gap_d, z_fp, p_fp,
    * f_fp). All quantities positive, so plain `//` matches JVM `/`.
    */
  def oracleSql: String =
    s"""ev AS MATERIALIZED (
       |  SELECT series, q,
       |    row_number() OVER (PARTITION BY series ORDER BY dd) AS rn,
       |    COALESCE(dd - lag(dd) OVER (PARTITION BY series ORDER BY dd), 1)
       |      AS gap_d
       |  FROM graft_demand
       |), cro(series, rn, q, gap_d, z, p) AS (
       |  SELECT series, rn, q, gap_d, q * $S, gap_d * $S
       |  FROM ev WHERE rn = 1
       |  UNION ALL
       |  SELECT ev.series, ev.rn, ev.q, ev.gap_d,
       |    (ev.q * $S + 3 * cro.z) // 4,
       |    (ev.gap_d * $S + 3 * cro.p) // 4
       |  FROM cro JOIN ev ON ev.series = cro.series AND ev.rn = cro.rn + 1
       |)
       |SELECT series, rn, q, gap_d, z AS z_fp, p AS p_fp,
       |  (z * 1000000) // p AS f_fp
       |FROM cro""".stripMargin
}

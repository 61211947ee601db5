package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kruskal-Wallis rank test (one-way ANOVA on ranks): do k groups share
  * a value distribution? The k-sample generalization of Mann-Whitney,
  * completing the hypothesis-testing tier next to the two-proportion
  * z-test (q_ab_test) and the KS drift statistic (q_ks_drift).
  *
  * Computed in the centered form `H = 12/(N(N+1)) Σ_j n_j(r̄_j − r̄)²`
  * with doubled ranks so tie-average ranks stay integral:
  * r2(v) = min_rank + max_rank = 2·cc(v) − cnt(v) + 1 off the cumulative
  * grid CDF; d_j = Σr2 − n_j(N+1) = 2n_j(r̄_j − r̄); T = Σ d_j² div (4n_j)
  * (quantized per group, then summed exactly). The single final double
  * `12·T/(N(N+1))` is one identical-op-order chain on both engines
  * (the q_wilson convention), quantized to 1e6 fp. Tie correction
  * C = 1 − Σ(t³−t)/(N³−N) in exact 1e12 fp divides H at the end.
  *
  * Scale shape: everything after the one grouped count runs on the
  * DISTINCT-VALUE GRID (cents-quantized, value-range-bounded — the
  * q_quantile_norm convention): the rank window and CDF never touch
  * corpus-sized frames. Headroom (the q_ols_trend convention): d_j and
  * the rank sums are exact int64 (|d_j| <= n_j·N < 2^63 up to corpus
  * sizes); d_j² goes through a DOUBLE square — identical op order on
  * both engines — because the int64 square would overflow on skewed
  * corpus-sized groups; the square is exact while |d_j| < 2^26·…
  * (n_j·N < 2^53, i.e. N ≈ 3e7 balanced) and identically-rounded
  * beyond. The tie term and both final ratios are double chains too.
  */
object Kruskal {

  /** Run the test over (grp: string, v: long) observations. Output: ONE
    * row (n_groups, n, t_stat, tie_fp, h_fp, h_corr_fp).
    */
  def hTest(obs: DataFrame): DataFrame = {
    val g = obs.groupBy(col("v"), col("grp")).agg(count(lit(1)).as("cnt"))
    val grid = g.groupBy(col("v")).agg(sum(col("cnt")).as("cv"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val rk = grid
      .withColumn("cc", sum(col("cv")).over(wCum))
      .select(col("v"), col("cv"),
        (lit(2) * col("cc") - col("cv") + 1).as("r2"))
    val grp = g.join(rk.select(col("v"), col("r2")), "v")
      .groupBy(col("grp"))
      .agg(sum(col("cnt")).as("nj"),
        sum(col("cnt") * col("r2")).as("r2j"))
    val tot = grp.agg(sum(col("nj")).as("n"),
      count(lit(1)).as("n_groups"))
    val ties = rk.agg(
      sum(col("cv") * col("cv") * col("cv") - col("cv")).as("tsum"))
    // T is exact int64; the final H and the tie correction are single
    // identical-op-order double chains (the q_wilson convention) — a
    // muldiv like (tsum * 1e12) div (n³ − n) would overflow int64 for
    // any corpus-sized n, so the ratios go through doubles, textually
    // identical on both engines, quantized at the very end
    grp.crossJoin(broadcast(tot))
      .select(col("nj"), col("n"), col("n_groups"),
        // d² through a double (identical op order): d = r2j − nj(N+1)
        // is exact int64 (|d| <= nj·N < 2^53 to exactness), but d² can
        // pass 2^63 on skewed corpus-sized groups — the double square
        // is deterministic on both engines, the int64 square is a crash
        expr("""CAST(floor((1e0 * (r2j - nj * (n + 1)))
               |  * (r2j - nj * (n + 1)) / (4e0 * nj)) AS BIGINT)"""
          .stripMargin).as("tj"))
      .groupBy(col("n"), col("n_groups"))
      .agg(sum(col("tj")).as("t_stat"))
      .crossJoin(broadcast(ties))
      .select(col("n_groups"), col("n"), col("t_stat"),
        expr("""CAST(floor((1e0 - tsum / (1e0 * n * n * n - n)) * 1e12)
               |  AS BIGINT)""".stripMargin).as("tie_fp"),
        expr("CAST(floor(12e0 * t_stat / (n * (n + 1e0)) * 1e6) AS BIGINT)")
          .as("h_fp"),
        expr("""CASE WHEN (1e0 - tsum / (1e0 * n * n * n - n)) <= 0e0
               |  THEN NULL
               |  ELSE CAST(floor(12e0 * t_stat / (n * (n + 1e0))
               |    / (1e0 - tsum / (1e0 * n * n * n - n)) * 1e6) AS BIGINT)
               |END""".stripMargin).as("h_corr_fp"))
  }

  /** DuckDB twin over a `graft_obs` (grp, v) relation. */
  def oracleSql: String =
    """g AS (
      |  SELECT v, grp, CAST(count(*) AS BIGINT) AS cnt
      |  FROM graft_obs GROUP BY v, grp
      |), grid AS (
      |  SELECT v, CAST(sum(cnt) AS BIGINT) AS cv FROM g GROUP BY v
      |), rk AS (
      |  SELECT v, cv,
      |    2 * CAST(sum(cv) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      - cv + 1 AS r2
      |  FROM grid
      |), grp AS (
      |  SELECT grp, CAST(sum(cnt) AS BIGINT) AS nj,
      |    CAST(sum(cnt * r2) AS BIGINT) AS r2j
      |  FROM g JOIN rk USING (v) GROUP BY grp
      |), tot AS (
      |  SELECT CAST(sum(nj) AS BIGINT) AS n,
      |    CAST(count(*) AS BIGINT) AS n_groups
      |  FROM grp
      |), ties AS (
      |  SELECT CAST(sum(cv * cv * cv - cv) AS BIGINT) AS tsum FROM grid
      |), tsum_t AS (
      |  SELECT n, n_groups,
      |    CAST(sum(CAST(floor((1e0 * (r2j - nj * (n + 1)))
      |      * (r2j - nj * (n + 1)) / (4e0 * nj)) AS BIGINT))
      |      AS BIGINT) AS t_stat
      |  FROM grp CROSS JOIN tot GROUP BY n, n_groups
      |)
      |SELECT n_groups, n, t_stat,
      |  CAST(floor((1e0 - tsum / (1e0 * n * n * n - n)) * 1e12)
      |    AS BIGINT) AS tie_fp,
      |  CAST(floor(12e0 * t_stat / (n * (n + 1e0)) * 1e6) AS BIGINT)
      |    AS h_fp,
      |  CASE WHEN (1e0 - tsum / (1e0 * n * n * n - n)) <= 0e0
      |    THEN NULL
      |    ELSE CAST(floor(12e0 * t_stat / (n * (n + 1e0))
      |      / (1e0 - tsum / (1e0 * n * n * n - n)) * 1e6) AS BIGINT)
      |  END AS h_corr_fp
      |FROM tsum_t CROSS JOIN ties""".stripMargin
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-rank (Mantel-Cox) test: do two right-censored survival curves
  * differ? The inferential member of the survival tier — [[KaplanMeier]]
  * ESTIMATES each curve, Nelson-Aalen accumulates its hazard, this TESTS
  * the two-group null (reference workload: churn comparison between two
  * acquisition cohorts).
  *
  * Over the POOLED life table (one row per distinct duration with any
  * exit), at each event time t with n_a/n_b at risk, d = d_a + d_b
  * observed deaths, n = n_a + n_b:
  * {{{
  *   O−E contribution   oe = d_a − d·n_a/n
  *   variance           v  = d·(n_a/n)·(n_b/n)·(n−d)/(n−1)
  *   chi2 = (Σ oe)² / Σ v      (1 df)
  * }}}
  * Fixed-point recipe (mirrored op-for-op by the oracle): oe_fp =
  * d_a·S − (d·n_a·S) div n on scale S = 1e6; the variance is the staged
  * scale-first chain t1 = (d·n_a·S) div n, t2 = (t1·n_b) div n, v_fp =
  * (t2·(n−d)) div max(n−1, 1) — every intermediate is bounded by n²·S,
  * so int64 headroom holds for pools up to ~3e6 subjects (the
  * PageRank/PcaPower headroom convention; shrink S for larger pools).
  * The final chi2 is ONE identical-op-order double chain (the q_wilson
  * convention) off the two int64 cumulative sums.
  *
  * Scale shape: the per-subject groupBy is the only corpus-sized stage;
  * risk sets come from cumulative window sums over the life table itself
  * (duration-range-bounded, never subject-bounded), exactly like
  * [[KaplanMeier.lifeTable]]. Window-only — hazard contributions add, so
  * unlike the KM product there is no recursion anywhere.
  */
object Logrank {

  val ScaleFp = 1000000L

  /** Run the two-group test over a subject frame (grp: string — exactly
    * two values, dur: long, churn: int 0/1; churn 0 = right-censored).
    * `grpA` names the group whose observed-minus-expected is reported.
    * Output: one row per pooled distinct EVENT duration (d > 0):
    * (dur, n_risk, n_a, n_b, d_a, d_b, oe_fp, v_fp, cum_oe_fp,
    * cum_v_fp, chi2_fp) — the last row's chi2_fp is the statistic.
    */
  def test(subjects: DataFrame, grpA: String): DataFrame = {
    val isA = (col("grp") === grpA).cast("long")
    val life = subjects
      .groupBy(col("dur"))
      .agg(
        sum(isA * col("churn")).as("d_a"),
        sum((lit(1L) - isA) * col("churn")).as("d_b"),
        sum(isA * (lit(1L) - col("churn"))).as("c_a"),
        sum((lit(1L) - isA) * (lit(1L) - col("churn"))).as("c_b"))
    // risk sets: group total minus every exit at strictly earlier
    // durations — cumulative windows over the life table itself (tiny:
    // bounded by the distinct-duration range, not by subjects)
    val wAll = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrev = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val risked = life
      .withColumn("n_a",
        sum(col("d_a") + col("c_a")).over(wAll)
          - coalesce(sum(col("d_a") + col("c_a")).over(wPrev), lit(0L)))
      .withColumn("n_b",
        sum(col("d_b") + col("c_b")).over(wAll)
          - coalesce(sum(col("d_b") + col("c_b")).over(wPrev), lit(0L)))
      .withColumn("n_risk", col("n_a") + col("n_b"))
      .withColumn("d", col("d_a") + col("d_b"))
      // contributions exist only at event times with both a death and a
      // nondegenerate pool (n > 1 for the variance denominator)
      .filter(col("d") > 0 && col("n_risk") > 1)
      .withColumn("oe_fp",
        col("d_a") * lit(ScaleFp)
          - expr(s"(d * n_a * $ScaleFp) div n_risk"))
      .withColumn("v_fp",
        expr(s"((((d * n_a * $ScaleFp) div n_risk) * n_b) div n_risk" +
          s" * (n_risk - d)) div (n_risk - 1)"))
    risked
      .withColumn("cum_oe_fp", sum(col("oe_fp")).over(wCum))
      .withColumn("cum_v_fp", sum(col("v_fp")).over(wCum))
      .withColumn("chi2_fp",
        expr(s"CAST(floor((1e0 * cum_oe_fp / $ScaleFp)" +
          s" * (1e0 * cum_oe_fp / $ScaleFp)" +
          s" / (1e0 * cum_v_fp / $ScaleFp) * $ScaleFp) AS BIGINT)"))
      .select(col("dur"), col("n_risk"), col("n_a"), col("n_b"),
        col("d_a"), col("d_b"), col("oe_fp"), col("v_fp"),
        col("cum_oe_fp"), col("cum_v_fp"), col("chi2_fp"))
  }

  /** DuckDB twin over a `graft_two` (grp, dur, churn) relation — the
    * identical window-only recipe, op for op.
    */
  def oracleSql(grpA: String): String =
    s"""lr_life AS (
       |  SELECT dur,
       |    CAST(sum(CASE WHEN grp = '$grpA' THEN churn ELSE 0 END) AS BIGINT) AS d_a,
       |    CAST(sum(CASE WHEN grp = '$grpA' THEN 0 ELSE churn END) AS BIGINT) AS d_b,
       |    CAST(sum(CASE WHEN grp = '$grpA' THEN 1 - churn ELSE 0 END) AS BIGINT) AS c_a,
       |    CAST(sum(CASE WHEN grp = '$grpA' THEN 0 ELSE 1 - churn END) AS BIGINT) AS c_b
       |  FROM graft_two GROUP BY dur
       |), lr_risk AS (
       |  SELECT dur, d_a, d_b,
       |    CAST(sum(d_a + c_a) OVER () AS BIGINT)
       |      - CAST(COALESCE(sum(d_a + c_a) OVER (ORDER BY dur
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |        AS BIGINT) AS n_a,
       |    CAST(sum(d_b + c_b) OVER () AS BIGINT)
       |      - CAST(COALESCE(sum(d_b + c_b) OVER (ORDER BY dur
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |        AS BIGINT) AS n_b
       |  FROM lr_life
       |), lr_ev AS (
       |  SELECT dur, n_a + n_b AS n_risk, n_a, n_b, d_a, d_b,
       |    d_a * $ScaleFp - ((d_a + d_b) * n_a * $ScaleFp) // (n_a + n_b) AS oe_fp,
       |    (((((d_a + d_b) * n_a * $ScaleFp) // (n_a + n_b)) * n_b) // (n_a + n_b)
       |     * (n_a + n_b - d_a - d_b)) // (n_a + n_b - 1) AS v_fp
       |  FROM lr_risk
       |  WHERE d_a + d_b > 0 AND n_a + n_b > 1
       |), lr_cum AS (
       |  SELECT *, CAST(sum(oe_fp) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_oe_fp,
       |    CAST(sum(v_fp) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_v_fp
       |  FROM lr_ev
       |)
       |SELECT dur, n_risk, n_a, n_b, d_a, d_b, oe_fp, v_fp,
       |  cum_oe_fp, cum_v_fp,
       |  CAST(floor((1e0 * cum_oe_fp / $ScaleFp)
       |    * (1e0 * cum_oe_fp / $ScaleFp)
       |    / (1e0 * cum_v_fp / $ScaleFp) * $ScaleFp) AS BIGINT) AS chi2_fp
       |FROM lr_cum""".stripMargin
}

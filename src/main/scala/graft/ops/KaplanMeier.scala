package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan-Meier product-limit survival estimator with right censoring —
  * the standard churn/retention curve (how long does a user/subscription
  * /device survive), in exact integer fixed point so the curve is
  * bit-identical at any parallelism and oracle-replayable.
  *
  * Life-table form: at each distinct duration t (ascending, per cohort)
  * with d_t observed deaths, c_t right-censored exits and n_t subjects
  * still at risk,
  * {{{
  *   S_t = S_(t-1) * (n_t - d_t) / n_t        S_start = 1
  * }}}
  * quantized as `S_fp = (S_fp * (n_t - d_t)) div n_t` on a 1e12 scale —
  * every quantity nonnegative, so truncating division IS floor on both
  * engines. Censored exits shrink the next risk set but never the
  * survival product (the whole point of KM vs a naive churn ratio).
  *
  * Int64 headroom: `S_fp <= 1e12` and the multiplier `n_t - d_t < n_t`,
  * so the product stays under `1e12 * n_1` — safe for cohorts up to
  * ~9e6 subjects at the 1e12 scale; lower the scale for larger cohorts.
  *
  * Scale shape: the per-subject reduction (one groupBy) is the only
  * corpus-sized stage. The survival fold runs on the LIFE TABLE — one
  * row per (cohort, distinct duration), bounded by the duration range,
  * never by subjects — via one `flatMapSortedGroups` per cohort (the
  * [[Holt]] O(1)-state ordered-fold shape). Risk sets come from a
  * cumulative window sum on the same tiny frame, not from rescanning
  * subjects.
  */
object KaplanMeier {

  /** Life-table fold row (public: Catalyst's generated deserializer
    * cannot access a private case class).
    */
  case class LifeRow(
      cohort: String, dur: Long, n_risk: Long, d: Long, c: Long)

  /** The life table of a subject frame (cohort: string, dur: long,
    * churn: int 0/1): one row per (cohort, distinct dur) with deaths d,
    * censored exits c and the risk set n_risk = cohort total minus
    * everyone who exited before t — a cumulative window sum over the
    * (tiny, duration-range-bounded) life table itself.
    */
  def lifeTable(subjects: DataFrame): DataFrame = {
    val life = subjects
      .groupBy(col("cohort"), col("dur"))
      .agg(sum(col("churn")).cast("long").as("d"),
        sum(lit(1) - col("churn")).cast("long").as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort")).orderBy(col("dur"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    life
      .withColumn("n_risk",
        sum(col("d") + col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("cohort"))
            .orderBy(col("dur"))
            .rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.unboundedFollowing))
          - coalesce(sum(col("d") + col("c")).over(w), lit(0L)))
      .select(col("cohort"), col("dur"), col("n_risk"), col("d"), col("c"))
  }

  /** Estimate per-cohort survival curves from a subject frame with
    * columns (cohort: string, dur: long, churn: int 0/1 — 1 = observed
    * event, 0 = right-censored at dur). Output: one row per (cohort,
    * distinct dur): (cohort, dur, n_risk, d, c, surv_fp).
    */
  def curve(subjects: DataFrame, scaleFp: Long = 1000000000000L): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    lifeTable(subjects)
      .as[LifeRow]
      .groupByKey(_.cohort)
      .flatMapSortedGroups($"dur") { (_, it) =>
        var s = scaleFp
        it.map { r =>
          s = s * (r.n_risk - r.d) / r.n_risk
          (r.cohort, r.dur, r.n_risk, r.d, r.c, s)
        }
      }
      .toDF("cohort", "dur", "n_risk", "d", "c", "surv_fp")
  }

  /** Nelson-Aalen cumulative hazard over the same life table:
    * H(t) = Σ_(s<=t) d_s/n_s, each increment quantized
    * `floor(d * scale / n_risk)` BEFORE the (order-independent integer)
    * cumulative sum. Unlike the KM product this is WINDOW-ONLY — no
    * sequential recurrence anywhere — because hazard increments add
    * where survival factors multiply. Output adds (haz_fp, cumhaz_fp).
    */
  def nelsonAalen(
      subjects: DataFrame, scaleFp: Long = 1000000000000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort")).orderBy(col("dur"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    lifeTable(subjects)
      .withColumn("haz_fp", expr(s"(d * $scaleFp) div n_risk"))
      .withColumn("cumhaz_fp", sum(col("haz_fp")).over(w))
      .select(col("cohort"), col("dur"), col("n_risk"), col("d"), col("c"),
        col("haz_fp"), col("cumhaz_fp"))
  }

  /** The shared life-table CTE body (DuckDB) over a `graft_subjects`
    * (cohort, dur, churn) relation.
    */
  private def lifeSql: String =
    """life AS MATERIALIZED (
      |  SELECT cohort, dur,
      |    CAST(sum(churn) AS BIGINT) AS d,
      |    CAST(sum(1 - churn) AS BIGINT) AS c,
      |    row_number() OVER (PARTITION BY cohort ORDER BY dur) AS rn,
      |    CAST(sum(count(*)) OVER (PARTITION BY cohort) AS BIGINT)
      |      - CAST(COALESCE(sum(count(*)) OVER (PARTITION BY cohort
      |          ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND
      |          1 PRECEDING), 0) AS BIGINT) AS n_risk
      |  FROM graft_subjects GROUP BY cohort, dur
      |)""".stripMargin

  /** DuckDB twin of [[nelsonAalen]] — same life CTE, windowed sums. */
  def naOracleSql(scaleFp: Long = 1000000000000L): String =
    s"""$lifeSql
       |SELECT cohort, dur, n_risk, d, c,
       |  (d * $scaleFp) // n_risk AS haz_fp,
       |  CAST(sum((d * $scaleFp) // n_risk) OVER (PARTITION BY cohort
       |    ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS cumhaz_fp
       |FROM life""".stripMargin

  /** The identical life-table recurrence as a DuckDB recursive CTE over
    * a `graft_subjects` (cohort, dur, churn) relation — the oracle twin
    * of [[curve]].
    */
  def oracleSql(scaleFp: Long = 1000000000000L): String =
    s"""$lifeSql, km(cohort, rn, dur, n_risk, d, c, surv_fp) AS (
       |  SELECT cohort, rn, dur, n_risk, d, c,
       |    ($scaleFp * (n_risk - d)) // n_risk
       |  FROM life WHERE rn = 1
       |  UNION ALL
       |  SELECT l.cohort, l.rn, l.dur, l.n_risk, l.d, l.c,
       |    (km.surv_fp * (l.n_risk - l.d)) // l.n_risk
       |  FROM km JOIN life l ON l.cohort = km.cohort AND l.rn = km.rn + 1
       |)
       |SELECT cohort, dur, n_risk, d, c, surv_fp FROM km""".stripMargin
}

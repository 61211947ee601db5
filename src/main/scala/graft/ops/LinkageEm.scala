package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi-Sunter probabilistic record linkage with EM-estimated
  * parameters (Fellegi & Sunter 1969; Winkler's EM formulation) — the
  * SCORING leg the entity-resolution tier was missing: FuzzyJoin blocks,
  * Matching/ConnectedComponents cluster, but nothing yet turns a field-
  * agreement pattern into a calibrated match weight. Given candidate
  * pairs with k=3 boolean agreement fields, EM alternates
  *
  *   E: w(γ) = p·Π t(m_j, γ_j) / (p·Π t(m_j, γ_j) + (1−p)·Π t(u_j, γ_j)),
  *      t(x, 1) = x, t(x, 0) = 1−x
  *   M: m_j = Σ n(γ)·w(γ)·γ_j / Σ n(γ)·w(γ),  u_j likewise on (1−w),
  *      p = Σ n(γ)·w(γ) / N
  *
  * entirely on the ≤ 2^k distinct-PATTERN rows — the corpus is touched
  * once (pair generation + one pattern-count agg); EM itself is
  * O(2^k · iters) regardless of pair count, the property that makes FS
  * the industry linkage model at any scale.
  *
  * Cross-engine exactness: everything is int64 fixed point ×1e6. The
  * E-step product chain keeps intermediates on a 1e12 scale (first
  * multiply raw, each later factor with `div 1e6`) so four 1%-clamped
  * factors cannot floor to zero; M-step ratios divide by
  * `greatest(1, S div 1e6)` so the numerator never needs a ×1e6
  * (headroom to ~9.2e12 pairs); all θ are clamped to [1e4, 99e4]
  * (the standard EM boundary guard). Every arithmetic step is emitted
  * from ONE template parameterized by the integer-division spelling
  * (`div` for Spark, `//` for DuckDB — the PACF template convention),
  * so the two engines cannot drift.
  */
object LinkageEm {

  /** EM iterations (E M ×3, then a final E-step publishes w). */
  val Iters = 3

  private val Scale = "1000000"
  private val ClampLo = "10000"
  private val ClampHi = "990000"

  private type IDiv = (String, String) => String

  /** t(x, a): the agreement-conditional factor. */
  private def t(x: String, a: String): String =
    s"(CASE WHEN $a = 1 THEN $x ELSE $Scale - $x END)"

  /** p·t1·t2·t3 on the 1e12 intermediate scale. */
  private def chain(idiv: IDiv, start: String, ts: Seq[String]): String =
    ts.tail.foldLeft(s"($start * ${ts.head})")(
      (acc, f) => idiv(s"($acc * $f)", Scale))

  private def pmSql(idiv: IDiv): String =
    chain(idiv, "p", Seq(t("m1", "a1"), t("m2", "a2"), t("m3", "a3")))

  private def puSql(idiv: IDiv): String =
    chain(idiv, s"($Scale - p)", Seq(t("u1", "a1"), t("u2", "a2"), t("u3", "a3")))

  /** w = pm·1e6 / (pm + pu) — pm, pu are on the 1e12 scale, ≥ 1e4 by
    * the clamps, so the denominator is never 0.
    */
  private def wSql(idiv: IDiv): String =
    idiv(s"(pm * $Scale)", "(pm + pu)")

  private def clamp(x: String): String =
    s"greatest($ClampLo, least($ClampHi, $x))"

  /** M-step ratio Σnum / (ΣwSum div 1e6) with the 1-guard. */
  private def ratio(idiv: IDiv, num: String, den: String): String =
    clamp(idiv(num, s"greatest(1, ${idiv(den, Scale)})"))

  private def sparkIdiv: IDiv = (a, b) => s"($a div $b)"
  private def duckIdiv: IDiv = (a, b) => s"($a // $b)"

  /** Spark side: `pat` = (a1, a2, a3, cnt) pattern counts (≤ 2^3 rows).
    * Returns (a1, a2, a3, n_pairs, w_fp, m1_fp..m3_fp, u1_fp..u3_fp,
    * p_fp) — the calibrated per-pattern match weight plus the fitted
    * model, all ×1e6.
    */
  def run(pat: DataFrame): DataFrame = {
    val idiv = sparkIdiv
    val spark = pat.sparkSession
    var theta = spark.range(1).select(
      lit(900000L).as("m1"), lit(900000L).as("m2"), lit(900000L).as("m3"),
      lit(100000L).as("u1"), lit(100000L).as("u2"), lit(100000L).as("u3"),
      lit(500000L).as("p"))
    def eStep(th: DataFrame): DataFrame = pat.crossJoin(broadcast(th))
      .withColumn("pm", expr(pmSql(idiv)))
      .withColumn("pu", expr(puSql(idiv)))
      .withColumn("w", expr(wSql(idiv)))
    for (_ <- 1 to Iters) {
      val e = eStep(theta)
      def mj(j: Int) = expr(ratio(idiv,
        s"sum(cnt * w * a$j)", "sum(cnt * w)")).as(s"m$j")
      def uj(j: Int) = expr(ratio(idiv,
        s"sum(cnt * ($Scale - w) * a$j)",
        s"sum(cnt * ($Scale - w))")).as(s"u$j")
      theta = e.agg(mj(1), mj(2), mj(3), uj(1), uj(2), uj(3),
        expr(clamp("(sum(cnt * w) div sum(cnt))")).as("p"))
    }
    eStep(theta).select(
      col("a1"), col("a2"), col("a3"), col("cnt").as("n_pairs"),
      col("w").as("w_fp"),
      col("m1").as("m1_fp"), col("m2").as("m2_fp"), col("m3").as("m3_fp"),
      col("u1").as("u1_fp"), col("u2").as("u2_fp"), col("u3").as("u3_fp"),
      col("p").as("p_fp"))
  }

  /** DuckDB oracle twin: per-iteration CTEs over `graft_fs_pat`
    * (a1, a2, a3, cnt) — same template, `//` spelling. Ends selecting
    * the same columns as [[run]].
    */
  def oracleSql(): String = {
    val idiv = duckIdiv
    val head =
      s"""fs_it0 AS (
         |  SELECT CAST(900000 AS BIGINT) AS m1, CAST(900000 AS BIGINT) AS m2,
         |    CAST(900000 AS BIGINT) AS m3, CAST(100000 AS BIGINT) AS u1,
         |    CAST(100000 AS BIGINT) AS u2, CAST(100000 AS BIGINT) AS u3,
         |    CAST(500000 AS BIGINT) AS p
         |)""".stripMargin
    val steps = (1 to Iters).map { i =>
      s"""fs_e$i AS MATERIALIZED (
         |  SELECT g.*, ${pmSql(idiv)} AS pm, ${puSql(idiv)} AS pu
         |  FROM graft_fs_pat g CROSS JOIN fs_it${i - 1}
         |), fs_ew$i AS (
         |  SELECT *, ${wSql(idiv)} AS w FROM fs_e$i
         |), fs_it$i AS MATERIALIZED (
         |  SELECT
         |    ${ratio(idiv, "CAST(sum(cnt * w * a1) AS BIGINT)", "CAST(sum(cnt * w) AS BIGINT)")} AS m1,
         |    ${ratio(idiv, "CAST(sum(cnt * w * a2) AS BIGINT)", "CAST(sum(cnt * w) AS BIGINT)")} AS m2,
         |    ${ratio(idiv, "CAST(sum(cnt * w * a3) AS BIGINT)", "CAST(sum(cnt * w) AS BIGINT)")} AS m3,
         |    ${ratio(idiv, s"CAST(sum(cnt * ($Scale - w) * a1) AS BIGINT)", s"CAST(sum(cnt * ($Scale - w)) AS BIGINT)")} AS u1,
         |    ${ratio(idiv, s"CAST(sum(cnt * ($Scale - w) * a2) AS BIGINT)", s"CAST(sum(cnt * ($Scale - w)) AS BIGINT)")} AS u2,
         |    ${ratio(idiv, s"CAST(sum(cnt * ($Scale - w) * a3) AS BIGINT)", s"CAST(sum(cnt * ($Scale - w)) AS BIGINT)")} AS u3,
         |    ${clamp("(CAST(sum(cnt * w) AS BIGINT) // CAST(sum(cnt) AS BIGINT))")} AS p
         |  FROM fs_ew$i
         |)""".stripMargin
    }
    val fin =
      s"""fs_fin AS (
         |  SELECT g.*, m1, m2, m3, u1, u2, u3, p,
         |    ${pmSql(idiv)} AS pm, ${puSql(idiv)} AS pu
         |  FROM graft_fs_pat g CROSS JOIN fs_it$Iters
         |)
         |SELECT a1, a2, a3, cnt AS n_pairs, ${wSql(idiv)} AS w_fp,
         |  m1 AS m1_fp, m2 AS m2_fp, m3 AS m3_fp,
         |  u1 AS u1_fp, u2 AS u2_fp, u3 AS u3_fp, p AS p_fp
         |FROM fs_fin""".stripMargin
    (head +: steps :+ fin).mkString(",\n")
  }
}

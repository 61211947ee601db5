package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact sign-test p-values + Benjamini-Hochberg step-up (BH 1995) over
  * a hypothesis grid, all in int64 — multiple-testing control for
  * experiment-health dashboards scanning hundreds of metric cells,
  * where uncorrected per-cell tests at alpha = 0.05 would "discover"
  * 5% of null cells every run.
  *
  * Per hypothesis (n paired trials, k positive): the two-sided exact
  * binomial tail p = min(1, 2 * Sum_{i<=min(k,n-k)} C(n,i) / 2^n).
  * C(n,i) threads through a fold as C(n,i) = C(n,i-1)*(n-i+1)/i —
  * stepwise-exact integer division — so p_fp = p * 1e6 is a pure
  * integer both engines compute identically; no normal approximation.
  * Headroom: the tail sum is < 2^n, so `2 * 2^n * 1e6 < 2^63` requires
  * n <= 40 — callers cap trials per cell at 40 (the cap also bounds the
  * fold at 20 steps/row), and the plan enforces it per row with
  * assert_true (n = 63 would wrap shiftleft to Long.MIN_VALUE, which
  * ANSI mode does not catch).
  *
  * BH at level alpha: reject the rank-ordered p_(1..m) up to the
  * largest j with p_(j) <= alpha * j / m — as the integer comparison
  * `p_fp * m <= alphaFp * rank`. The rank/step-up windows run on the
  * hypothesis grid (a few hundred rows), never on the data.
  */
object Fdr {

  /** Apply the exact sign-test + BH to a hypothesis grid `cells` with
    * columns (k1 string, k2 long, n, k): n paired trials (1 <= n <= 40),
    * k positive. Output: (k1, k2, n, k, p_fp, rk, reject 0/1).
    */
  def bh(cells: DataFrame, alphaFp: Long = 50000L): DataFrame = {
    val pv = cells
      .withColumn("j", least(col("k"), col("n") - col("k")))
      // the n <= 40 headroom precondition is enforced IN the plan
      // (assert_true raises per row): n = 63 would hit
      // shiftleft(1L, 63) = Long.MIN_VALUE — a bit-shift wrap that ANSI
      // mode does NOT catch — making p_fp negative and rank-1, silently
      // inflating the BH rejection set
      .select(col("k1"), col("k2"), col("n"), col("k"),
        expr("""CASE WHEN assert_true(n >= 1 AND n <= 40,
               |  'Fdr.bh: n must be in [1, 40] (int64 headroom)') IS NULL
               |THEN least(1000000L,
               |  (2 * (CASE WHEN j = 0 THEN 1L ELSE
               |     aggregate(sequence(1, CAST(j AS INT)),
               |       named_struct('c', 1L, 's', 1L),
               |       (acc, i) -> named_struct(
               |         'c', (acc.c * (n - i + 1)) div i,
               |         's', acc.s + (acc.c * (n - i + 1)) div i),
               |       acc -> acc.s) END) * 1000000L)
               |  div shiftleft(1L, CAST(n AS INT))) END""".stripMargin)
          .as("p_fp"))
    val wRank = Window.orderBy(col("p_fp"), col("k1"), col("k2"))
    val all = Window.partitionBy()
    pv.withColumn("rk", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("jmax",
        max(when(col("p_fp") * col("m") <= lit(alphaFp) * col("rk"),
          col("rk"))).over(all))
      .select(col("k1"), col("k2"), col("n"), col("k"),
        col("p_fp"), col("rk"),
        when(col("rk") <= coalesce(col("jmax"), lit(0L)), 1)
          .otherwise(0).as("reject"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entropic optimal transport between two 2-D event distributions by
  * Sinkhorn-Knopp matrix scaling (Cuturi 2013) — the drift tier's
  * multi-dimensional leg: q_ks_drift/q_emd_drift compare 1-D marginals
  * (and exact 1-D EMD does not generalize), the OT PLAN says how much
  * probability mass moved WHERE on the joint (value-decile ×
  * hour-of-day) grid, and its cost is the regularized 2-D Wasserstein
  * distance a monitoring pipeline alerts on.
  *
  * Scale shape: the corpus is touched ONCE (two conditional histogram
  * aggs over the grid); everything after lives on the ≤ `Cells`-point
  * supports — the kernel matrix is ≤ Cells² metadata rows and each of
  * the `Iters` scaling rounds is one equi-join + one bounded groupBy
  * per side. This is the defining property of histogram-space OT: the
  * data size never enters the iteration.
  *
  * Cross-engine exactness: the Gibbs kernel exp(−cost/λ) is the one
  * transcendental — it is PRECOMPUTED in Scala and emitted as integer
  * LITERALS into both engines (the DcgW convention), cost = Manhattan
  * grid distance ∈ [0, 16]. Scaling updates are pure int64 fixed point:
  * marginals ×1e6, u_i = r_i·1e12 div max(1, Σ_j K_ij·v_j) (Σ ≤
  * 80·1e12 — headroom-safe), v symmetric, `greatest(1, ·)` guards on
  * every denominator and on u/v themselves (a floored zero would
  * poison the next round on both engines identically, but a live 1
  * keeps the fixed point meaningful); asymmetric ceilings on u/v (see
  * [[upd]]) bound every downstream product inside int64. Plan entries
  * rescale stepwise ((u·K) div 1e6)·(v div 1e3) div 1e3.
  */
object Sinkhorn {

  val Iters = 15
  private val Lambda = 4.0

  /** floor(1e6·exp(−c/λ)) for Manhattan cost c = 0..16 — shared integer
    * literals (computed once here, emitted into both engines).
    */
  private val KTable: IndexedSeq[Long] =
    (0 to 16).map(c => math.floor(1e6 * math.exp(-c / Lambda)).toLong)

  private def kCase(cost: String): String =
    s"CASE $cost" + KTable.zipWithIndex.map { case (v, c) =>
      s" WHEN $c THEN CAST($v AS BIGINT)"
    }.mkString + " END"

  private type IDiv = (String, String) => String
  private def sparkIdiv: IDiv = (a, b) => s"($a div $b)"
  private def duckIdiv: IDiv = (a, b) => s"($a // $b)"

  /** u_i (or v_j) update: marginal·1e12 div max(1, Σ K·other), clamped
    * into [1, hi]. The asymmetric ceilings (u ≤ 1e10, v ≤ 1e8) bound
    * every downstream product: Σ K·u ≤ 80·1e6·1e10 = 8e17, plan entry
    * ((u·K) div 1e6)·(v div 1e3) ≤ 1e15, cost sum ≤ 1e17 — all int64-
    * safe; the ceilings sit 4+ orders above the nominal operating
    * scales (u ~1e4, v ~1e6), so they bind only under degenerate
    * all-mass-in-one-cell inputs, identically on both engines.
    */
  private def upd(idiv: IDiv, marginal: String, ksum: String,
      hi: String): String =
    s"greatest(1, least($hi, " +
      s"${idiv(s"($marginal * 1000000000000)", s"greatest(1, $ksum)")}))"
  private val UHi = "10000000000"
  private val VHi = "100000000"

  /** Spark side over `events`-shaped input (h = 0/1 population tag,
    * vb = value decile 0..9, hb = hour bucket 0..7 — prepared by the
    * caller). Returns the transport plan (vb_a, hb_a, vb_b, hb_b, k_ij,
    * p_fp) with the total regularized cost ot_cost_fp repeated per row.
    */
  def run(cells: DataFrame): DataFrame = {
    val idiv = sparkIdiv
    def marg(h: Int, v: String, hc: String) = cells
      .filter(col("h") === h)
      .groupBy(col("vb").as(v), col("hb").as(hc))
      .agg(count(lit(1)).as("cnt"))
    def toProb(df: DataFrame, v: String, hc: String, m: String) = {
      val tot = df.agg(sum(col("cnt")).as("tot"))
      df.crossJoin(broadcast(tot))
        .select(col(v), col(hc),
          expr(idiv("(cnt * 1000000)", "tot")).as(m))
    }
    val ra = Iterate.materialize(toProb(marg(0, "vb_a", "hb_a"), "vb_a", "hb_a", "r"))
    val cb = Iterate.materialize(toProb(marg(1, "vb_b", "hb_b"), "vb_b", "hb_b", "c"))
    val k = Iterate.materialize(ra.crossJoin(cb)
      .withColumn("cost",
        expr("abs(vb_a - vb_b) + abs(hb_a - hb_b)"))
      .withColumn("k_ij", expr(kCase("(abs(vb_a - vb_b) + abs(hb_a - hb_b))"))))

    var u = ra.select(col("vb_a"), col("hb_a"), lit(1000000L).as("u"))
    var v = cb.select(col("vb_b"), col("hb_b"), lit(1000000L).as("v"))
    for (_ <- 1 to Iters) {
      u = Iterate.materialize(
        k.join(v, Seq("vb_b", "hb_b"))
          .groupBy("vb_a", "hb_a")
          .agg(sum(expr("k_ij * v")).as("kv"), max(col("r")).as("r"))
          .select(col("vb_a"), col("hb_a"),
            expr(upd(idiv, "r", "kv", UHi)).as("u")))
      v = Iterate.materialize(
        k.join(u, Seq("vb_a", "hb_a"))
          .groupBy("vb_b", "hb_b")
          .agg(sum(expr("k_ij * u")).as("ku"), max(col("c")).as("c"))
          .select(col("vb_b"), col("hb_b"),
            expr(upd(idiv, "c", "ku", VHi)).as("v")))
    }
    val plan = k.join(u, Seq("vb_a", "hb_a")).join(v, Seq("vb_b", "hb_b"))
      .select(col("vb_a"), col("hb_a"), col("vb_b"), col("hb_b"),
        col("k_ij"), col("cost"),
        expr(idiv(s"(${idiv("(u * k_ij)", "1000000")} * ${idiv("v", "1000")})", "1000"))
          .as("p_fp"))
    val cost = plan.agg(sum(expr("p_fp * cost")).as("ot_cost_fp"))
    plan.crossJoin(broadcast(cost))
      .select(col("vb_a"), col("hb_a"), col("vb_b"), col("hb_b"),
        col("k_ij"), col("p_fp"), col("ot_cost_fp"))
  }

  /** DuckDB twin over `graft_ot_cells` (h, vb, hb) — same template,
    * `//` spelling, per-iteration CTEs. Ends selecting the same columns
    * as [[run]].
    */
  def oracleSql(): String = {
    val idiv = duckIdiv
    val head =
      s"""ot_ra AS MATERIALIZED (
         |  SELECT vb AS vb_a, hb AS hb_a,
         |    ${idiv("(CAST(count(*) AS BIGINT) * 1000000)",
                     "(SELECT CAST(count(*) AS BIGINT) FROM graft_ot_cells WHERE h = 0)")} AS r
         |  FROM graft_ot_cells WHERE h = 0 GROUP BY vb, hb
         |), ot_cb AS MATERIALIZED (
         |  SELECT vb AS vb_b, hb AS hb_b,
         |    ${idiv("(CAST(count(*) AS BIGINT) * 1000000)",
                     "(SELECT CAST(count(*) AS BIGINT) FROM graft_ot_cells WHERE h = 1)")} AS c
         |  FROM graft_ot_cells WHERE h = 1 GROUP BY vb, hb
         |), ot_k AS MATERIALIZED (
         |  SELECT vb_a, hb_a, vb_b, hb_b, r, c,
         |    abs(vb_a - vb_b) + abs(hb_a - hb_b) AS cost,
         |    ${kCase("(abs(vb_a - vb_b) + abs(hb_a - hb_b))")} AS k_ij
         |  FROM ot_ra CROSS JOIN ot_cb
         |), ot_v0 AS (
         |  SELECT vb_b, hb_b, CAST(1000000 AS BIGINT) AS v FROM ot_cb
         |)""".stripMargin
    val steps = (1 to Iters).map { i =>
      s"""ot_u$i AS MATERIALIZED (
         |  SELECT k.vb_a, k.hb_a,
         |    ${upd(idiv, "max(k.r)", "CAST(sum(k.k_ij * p.v) AS BIGINT)", UHi)} AS u
         |  FROM ot_k k JOIN ot_v${i - 1} p USING (vb_b, hb_b)
         |  GROUP BY k.vb_a, k.hb_a
         |), ot_v$i AS MATERIALIZED (
         |  SELECT k.vb_b, k.hb_b,
         |    ${upd(idiv, "max(k.c)", "CAST(sum(k.k_ij * p.u) AS BIGINT)", VHi)} AS v
         |  FROM ot_k k JOIN ot_u$i p USING (vb_a, hb_a)
         |  GROUP BY k.vb_b, k.hb_b
         |)""".stripMargin
    }
    val fin =
      s"""ot_plan AS MATERIALIZED (
         |  SELECT k.vb_a, k.hb_a, k.vb_b, k.hb_b, k.k_ij, k.cost,
         |    ${idiv(s"(${idiv("(p.u * k.k_ij)", "1000000")} * ${idiv("q.v", "1000")})", "1000")} AS p_fp
         |  FROM ot_k k
         |  JOIN ot_u$Iters p USING (vb_a, hb_a)
         |  JOIN ot_v$Iters q USING (vb_b, hb_b)
         |)
         |SELECT vb_a, hb_a, vb_b, hb_b, k_ij, p_fp,
         |  (SELECT CAST(sum(p_fp * cost) AS BIGINT) FROM ot_plan)
         |    AS ot_cost_fp
         |FROM ot_plan""".stripMargin
    (head +: steps :+ fin).mkString(",\n")
  }
}

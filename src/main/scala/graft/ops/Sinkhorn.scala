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
    *
    * EAGER-EXECUTION CONTRACT: unlike a plain DataFrame transform, this
    * op runs the two histogram-aggregate Spark jobs AT CALL TIME (the
    * collected marginals are ≤ Cells rows of grid metadata by
    * construction) and the returned frame is a LocalTableScan of the
    * driver-computed plan. Callers must invoke it inside the timed /
    * audited region; vb/hb accept any integral type (cast to long
    * before collection).
    */
  def run(cells: DataFrame): DataFrame = {
    val idiv = sparkIdiv
    val spark = cells.sparkSession
    def marg(h: Int, v: String, hc: String) = cells
      .filter(col("h") === h)
      .groupBy(col("vb").as(v), col("hb").as(hc))
      .agg(count(lit(1)).as("cnt"))
    def toProb(df: DataFrame, v: String, hc: String, m: String) = {
      val tot = df.agg(sum(col("cnt")).as("tot"))
      df.crossJoin(broadcast(tot))
        .select(col(v).cast("long").as(v), col(hc).cast("long").as(hc),
          expr(idiv("(cnt * 1000000)", "tot")).as(m))
    }
    // the corpus is touched ONCE per side (the histogram aggs above);
    // the supports are <= Cells rows of grid metadata by construction
    // (vb x hb is value-range-bounded), so the 15 scaling rounds run
    // DRIVER-LOCAL over the collected marginals — the r8 form ran 30
    // materialized Spark rounds over <= 80-row frames and measured as
    // 173 back-to-back ~35 ms jobs of pure stage latency. Same int64
    // recurrence (integer sums are order-free, all operands positive,
    // so JVM / == both engines' div), bit-identical output.
    val raRows = toProb(marg(0, "vb_a", "hb_a"), "vb_a", "hb_a", "r")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cbRows = toProb(marg(1, "vb_b", "hb_b"), "vb_b", "hb_b", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nA = raRows.length
    val nB = cbRows.length
    val kij = Array.tabulate(nA, nB) { (i, j) =>
      val cost = math.abs(raRows(i)._1 - cbRows(j)._1) +
        math.abs(raRows(i)._2 - cbRows(j)._2)
      KTable(cost.toInt)
    }
    val uHi = UHi.toLong
    val vHi = VHi.toLong
    def updL(marginal: Long, ksum: Long, hi: Long): Long =
      math.max(1L, math.min(hi,
        (marginal * 1000000000000L) / math.max(1L, ksum)))
    val u = Array.fill(nA)(1000000L)
    val v = Array.fill(nB)(1000000L)
    for (_ <- 1 to Iters) {
      var i = 0
      while (i < nA) {
        var kv = 0L
        var j = 0
        while (j < nB) { kv += kij(i)(j) * v(j); j += 1 }
        u(i) = updL(raRows(i)._3, kv, uHi)
        i += 1
      }
      var j = 0
      while (j < nB) {
        var ku = 0L
        var i2 = 0
        while (i2 < nA) { ku += kij(i2)(j) * u(i2); i2 += 1 }
        v(j) = updL(cbRows(j)._3, ku, vHi)
        j += 1
      }
    }
    var otCost = 0L
    val pfp = Array.tabulate(nA, nB) { (i, j) =>
      val p = (((u(i) * kij(i)(j)) / 1000000L) * (v(j) / 1000L)) / 1000L
      val cost = math.abs(raRows(i)._1 - cbRows(j)._1) +
        math.abs(raRows(i)._2 - cbRows(j)._2)
      otCost += p * cost
      p
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](nA * nB)
    for (i <- 0 until nA; j <- 0 until nB)
      out.add(org.apache.spark.sql.Row(
        raRows(i)._1, raRows(i)._2, cbRows(j)._1, cbRows(j)._2,
        kij(i)(j), pfp(i)(j), otCost))
    val lf = org.apache.spark.sql.types.LongType
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(
      Seq("vb_a", "hb_a", "vb_b", "hb_b", "k_ij", "p_fp", "ot_cost_fp")
        .map(org.apache.spark.sql.types.StructField(_, lf, nullable = false))))
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

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Strongly connected components of a FUNCTIONAL graph (out-degree 1,
  * the Pollard-rho shape: every component is a cycle with trees hanging
  * off it) by parallel pointer doubling — O(log n) rounds, no driver
  * convergence loop.
  *
  * Doubling state per node v: (f = succ^(2^j)(v), mn = min of the 2^j
  * path nodes v .. succ^(2^j - 1)(v)). One self-equi-join per round
  * composes both: f' = f∘f, mn' = min(mn(v), mn(f(v))). After
  * K = ceil(log2(n)) rounds the window covers the whole rho, so:
  *
  *   - F(v) = succ^(2^K)(v) lands ON the cycle for every v (2^K >= n
  *     exceeds any tail length), hence image(F) = exactly the cycle
  *     nodes (F restricted to a cycle is a rotation — surjective onto
  *     it; tails are never hit from 2^K steps ahead);
  *   - cycle_min c(v) = M(F(v)) (the min over 2^K nodes starting on
  *     the cycle = the cycle's min, the canonical SCC id);
  *   - scc_id(v) = c(v) if v ∈ image(F) (on a cycle — nontrivial SCC
  *     or self-loop) else v (tail nodes are singleton SCCs);
  *   - scc_size = cycle length for cyclic nodes (count per c over the
  *     cycle-node set), 1 for tails.
  *
  * All exact integer/equi-join algebra: K n-row joins + one distinct +
  * one semi-join + one bounded groupBy — every step partition-parallel,
  * nothing ever materializes a reachability closure. The DuckDB oracle
  * (`oracleSql`) is the textbook DEFINITION instead — mutual
  * reachability over a recursive closure — so the gate checks two
  * INDEPENDENT algorithms against each other.
  *
  * The one driver-side value is n (node count), which sizes the loop
  * DEPTH K — structural, not data-plane (the BPE-round precedent).
  */
object Scc {

  /** `nodes`: one column `v` (BIGINT, distinct). `succOf(col, n)` builds
    * the successor expression (n = node count, for modular maps).
    * Output: (node, scc_id, on_cycle, scc_size).
    *
    * PRECONDITION: the successor map must be CLOSED over `nodes` —
    * every succ value is itself a node (e.g. a modular map over a
    * contiguous 0..n-1 key set). The doubling join is an inner join on
    * that assumption; a dangling successor would silently drop its
    * whole upstream chain, so the result is guarded by a loud row-count
    * check against n (one cheap count over the final checkpointed
    * frame).
    */
  def run(
      spark: SparkSession, nodes: DataFrame,
      succOf: (org.apache.spark.sql.Column, Long) =>
        org.apache.spark.sql.Column): DataFrame =
    runFull(spark, nodes, succOf).drop("term_id")

  /** [[run]] plus the TERMINAL-cycle id of every node (`term_id`): the
    * canonical id of the unique cycle the node's successor chain ends
    * on — equal to scc_id for cyclic nodes, and for tail nodes the id
    * of the cycle downstream. Falls out of the doubling state for free
    * (c(v) = M(F(v)) is already computed for every node; [[run]] keeps
    * it only for cyclic ones), and is what reachability-structure
    * queries (bow-tie decomposition) need.
    */
  def runFull(
      spark: SparkSession, nodes: DataFrame,
      succOf: (org.apache.spark.sql.Column, Long) =>
        org.apache.spark.sql.Column): DataFrame = {
    val n = nodes.count() // sizes K (and the modular succ map)
    val k = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, n - 1)))
    Iterate.withWidth(spark, n) { p =>
      var st = Iterate.materialize(
        nodes.select(col("v"), succOf(col("v"), n).as("f"), col("v").as("mn"))
          .repartition(p, col("v")))
      val cadence = new Iterate.Cadence(st)
      for (j <- 1 to k.toInt) {
        val a = st.select(col("v"), col("f"), col("mn"))
        val b = st.select(col("v").as("bv"), col("f").as("bf"),
          col("mn").as("bmn"))
        st = cadence.step(j, j == k.toInt,
          a.join(b, a("f") === b("bv"))
            .select(col("v"), col("bf").as("f"),
              least(col("mn"), col("bmn")).as("mn")))
      }
      // c(v) = M(F(v)): one more lookup of the doubled state at F(v)
      val m = st.select(col("v").as("mv"), col("mn").as("mmn"))
      val withC = st.join(m, st("f") === m("mv"))
        .select(col("v"), col("f"), col("mmn").as("c"))
      // image(F) = the cycle nodes
      val cyc = st.select(col("f").as("v")).distinct()
      val flagged = withC.join(cyc.withColumn("on_cycle", lit(true)),
        Seq("v"), "left")
        .select(col("v"), col("c"),
          coalesce(col("on_cycle"), lit(false)).as("on_cycle"))
      // cycle length per canonical id, over cycle nodes only
      val lens = flagged.filter(col("on_cycle"))
        .groupBy(col("c")).agg(count(lit(1)).as("clen"))
      // materialize the epilogue INSIDE the scoped width (the withWidth
      // contract: loop ops hand back checkpointed frames) — and use the
      // now-free count to enforce the closure precondition loudly
      val out = Iterate.materialize(
        flagged.join(lens, Seq("c"), "left")
          .select(col("v").as("node"),
            when(col("on_cycle"), col("c")).otherwise(col("v")).as("scc_id"),
            col("on_cycle"),
            when(col("on_cycle"), col("clen")).otherwise(1L).as("scc_size"),
            col("c").as("term_id")))
      val got = out.count()
      require(got == n,
        s"successor map is not closed over the node set: $got of $n nodes " +
          "survived the doubling joins (a succ value is missing from " +
          "`nodes`) — Scc.run requires succ: nodes -> nodes")
      out
    }
  }

  /** Definition-based DuckDB twin over a `graft_fn(v, s)` successor
    * CTE: recursive closure, then scc_id(v) = min over the mutual-
    * reachability set (which always contains v), on_cycle(v) =
    * reach(succ(v), v), scc_size = |mutual set|.
    */
  val oracleCtes: String =
    """reach AS (
      |  SELECT v AS root, v AS node FROM graft_fn
      |  UNION
      |  SELECT r.root, e.s FROM reach r JOIN graft_fn e ON e.v = r.node
      |), mutual AS (
      |  SELECT a.root AS v, a.node AS u
      |  FROM reach a JOIN reach b ON b.root = a.node AND b.node = a.root
      |), agg AS (
      |  SELECT v, CAST(min(u) AS BIGINT) AS scc_id,
      |    CAST(count(*) AS BIGINT) AS scc_size
      |  FROM mutual GROUP BY v
      |)""".stripMargin

  val oracleSql: String =
    oracleCtes + "\n" +
      """SELECT agg.v AS node, agg.scc_id,
        |  EXISTS (SELECT 1 FROM reach r JOIN graft_fn e ON e.v = agg.v
        |          WHERE r.root = e.s AND r.node = agg.v) AS on_cycle,
        |  agg.scc_size
        |FROM agg""".stripMargin
}

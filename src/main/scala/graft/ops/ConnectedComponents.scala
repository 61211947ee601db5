package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list, via the alternating
  * large-star / small-star algorithm (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014). This is the missing
  * piece that turns pairwise near-dup candidates (`NearDup.*Pairs`) into
  * TRANSITIVE duplicate clusters: `dedupByMinhash`'s one-hop min-id rep
  * splits a chain A~B~C into two groups; components collapse it to one.
  *
  * Scale shape: each round is two (groupBy + equi-join) passes over the
  * edge frame — hash-partitioned on node id, no all-pairs products, no
  * driver-side graph. Convergence is O(log n) rounds on real graphs
  * (near-dup clusters, with tiny diameters, converge in 2-3); every
  * round materializes through a checkpoint so the plan stays flat
  * instead of growing with the iteration count (the same pattern as
  * `IvfIndex`'s Lloyd loop).
  *
  * Fault tolerance: if `spark.sparkContext.setCheckpointDir` is set the
  * loop uses reliable checkpoints (the cluster deployment path);
  * otherwise `localCheckpoint` (executor-local blocks — fine for
  * local-mode tests, lost on executor failure).
  */
object ConnectedComponents {

  /** Large-star: every node connects its strictly-larger neighbors to
    * the minimum of its closed neighborhood.
    */
  private[ops] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .filter(col("u") =!= col("v"))
    val mins = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Small-star: edges oriented large→small; every node connects its
    * smaller neighbors (and itself) to its minimum neighbor.
    */
  private[ops] def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
        greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
    oriented.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .union(mins.select(col("u").as("src"), col("m").as("dst")))
      .distinct()
  }

  private def materialize(df: DataFrame): DataFrame = Iterate.materialize(df)

  /** (count, order-independent content hash) — equality across one
    * iteration is the fixpoint test. `bit_xor` over per-edge xxhash64 is
    * order-independent and overflow-free under ANSI mode (the edge frame
    * is distinct, so xor cancellation needs a 2^-64-scale collision);
    * the alternative (set `except`) costs an extra join per round for no
    * practical gain.
    */
  private def signature(df: DataFrame): (Long, Long) = {
    val r = df.agg(
      count(lit(1)),
      coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Component membership for every node present in `edges`:
    * (id, rep) with rep = minimum node id of the component. Nodes that
    * appear in no edge are absent (singletons are the caller's
    * left-join default, see `q_dedup_cc`). Deterministic at any
    * parallelism; throws if `maxIter` rounds don't reach the fixpoint
    * (provably impossible below O(log^2 n) rounds).
    */
  def run(
      edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIter: Int = 25): DataFrame = {
    var cur = materialize(
      edges.select(col(src).as("src"), col(dst).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct())
    var sig = signature(cur)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = materialize(smallStar(largeStar(cur)))
      val nsig = signature(next)
      converged = nsig == sig
      sig = nsig
      cur.unpersist()
      cur = next
      it += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    // at the fixpoint the edges form stars: every non-min node points at
    // its component min, and each min appears only as a dst
    cur.select(col("src").as("id"), col("dst").as("rep"))
      .union(cur.select(col("dst").as("id"), col("dst").as("rep")))
      .groupBy("id").agg(min(col("rep")).as("rep"))
  }

  /** Incremental variant: fold newly-discovered edges into an existing
    * assignment (the `(id, rep)` output of a previous [[run]]) without
    * recomputing from the full historical edge list. The previous stars
    * re-enter as edges — already at the fixpoint shape — so the
    * contraction converges in a round or two over |prev| + |delta|
    * rows; the historical pair-generation (the expensive LSH part) is
    * never repeated. Output: the updated full (id, rep) assignment,
    * equal to a from-scratch run over the union of all edges ever seen.
    */
  def merge(
      prev: DataFrame, newEdges: DataFrame,
      src: String = "src", dst: String = "dst",
      maxIter: Int = 25): DataFrame =
    run(
      prev.select(col("id").as("src"), col("rep").as("dst"))
        .union(newEdges.select(col(src).as("src"), col(dst).as("dst"))),
      maxIter = maxIter)
}

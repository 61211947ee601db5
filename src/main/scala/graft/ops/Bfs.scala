package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances over a directed edge list — the
  * graph-distance primitive next to [[PageRank]]/[[Hits]] on the same
  * trade graph: distance-from-trusted-set is a standard crawl-curation
  * feature (how many link hops from a whitelisted seed a document
  * sits), and the same pass computes reachability tiers for
  * link-graph-aware sampling.
  *
  * Reference scope: extension surface (the reference has no graph
  * operators — its data plane is flat candle rows,
  * services/stream-processing/app/consumer.py); part of the
  * training-data pipeline tier.
  *
  * Semantics: `hop(v)` = length of the shortest directed path from ANY
  * seed to `v`, capped at `maxHops`; unreached nodes are absent from
  * the output (the caller left-joins and treats null as unreachable).
  * Seeds not present in the graph still appear at hop 0 (they are
  * valid sources). Everything is set algebra over exact keys — no
  * floats, no randomness — so the result is partition-invariant and
  * the DuckDB oracle replays the identical frontier expansion.
  *
  * Scale shape: the edge relation is distincted ONCE, checkpointed,
  * and pinned hash-partitioned on `src` ([[PageRank]]'s convention, via
  * [[Iterate.withWidth]]); each round joins only the CURRENT frontier
  * (nodes first reached last round) against it, so per-round work is
  * frontier-sized, and the visited set grows monotonically with
  * per-round checkpoints keeping lineage flat. No all-pairs step, no
  * driver-side graph state.
  */
object Bfs {

  private def materialize(df: DataFrame): DataFrame = Iterate.materialize(df)

  /** (node, hop) for every node within `maxHops` directed hops of the
    * seed set (single-column frame of start nodes).
    */
  def run(
      edges: DataFrame, seeds: DataFrame, maxHops: Int,
      src: String = "src", dst: String = "dst"): DataFrame = {
    require(maxHops >= 1)
    val e0 = materialize(
      edges.select(col(src).as("src"), col(dst).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct())
    Iterate.withWidth(edges.sparkSession, e0.count()) { p =>
    val e = materialize(e0.repartition(p, col("src")))
    e0.unpersist()
    var frontier = materialize(
      seeds.toDF("node").distinct().withColumn("hop", lit(0)))
    var visited = frontier
    for (t <- 1 to maxHops) {
      // neighbors of the current frontier not seen before: the min-hop
      // property needs no argmin because expansion is level-synchronous —
      // a node reached now cannot have been reachable earlier
      val next = materialize(
        frontier.join(e, frontier("node") === e("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited.select(col("node").as("v")),
            col("node") === col("v"), "left_anti")
          .withColumn("hop", lit(t)))
      val grown = materialize(visited.union(next))
      frontier.unpersist(); visited.unpersist()
      frontier = next
      visited = grown
    }
    visited
    } // withWidth
  }

  /** The identical frontier expansion as unrolled DuckDB CTEs over
    * `graft_edges` (src, dst) and `graft_bfs_seeds` (node) — the oracle
    * twin of [[run]]; kept adjacent so the two cannot drift. Ends
    * selecting (node, hop).
    */
  def oracleSql(maxHops: Int): String = {
    val head =
      """be AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM graft_edges WHERE src <> dst
        |), vis0 AS (SELECT DISTINCT node, 0 AS hop FROM graft_bfs_seeds)""".stripMargin
    val steps = (1 to maxHops).map { t =>
      s"""nxt$t AS MATERIALIZED (
         |  SELECT DISTINCT be.dst AS node, $t AS hop
         |  FROM vis${t - 1} f JOIN be ON be.src = f.node
         |  WHERE f.hop = ${t - 1}
         |    AND be.dst NOT IN (SELECT node FROM vis${t - 1})
         |), vis$t AS MATERIALIZED (
         |  SELECT node, hop FROM vis${t - 1}
         |  UNION ALL SELECT node, hop FROM nxt$t
         |)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT node, hop FROM vis$maxHops"
  }
}

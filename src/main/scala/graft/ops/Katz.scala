package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Katz centrality with an exact-integer walk expansion — the
  * attenuation-weighted cousin of [[PageRank]]: a node's score is the
  * number of walks of every length ending at it, each length discounted
  * by β^len. Unlike PageRank there is NO degree normalization, so hubs
  * are rewarded for raw reach — the classic influence measure for
  * co-occurrence graphs (Katz 1953).
  *
  * Reference scope: extension surface (the reference has no graph
  * operators); part of the training-data pipeline tier (link-graph
  * quality priors for crawl curation, next to q_pagerank/q_trustrank).
  *
  * Cross-engine exactness: β is pinned at 1/2 and the series truncated
  * at `Rounds` = 4, so the score scaled by 2^Rounds is the INTEGER
  *   katz16(v) = Σ_{k=1..4} walks_k(v) · 2^(4-k)
  * where walks_k(v) = |walks of length k ending at v| — pure int64
  * counting, no floats, no convergence test; both engines replay the
  * same truncated series ([[oracleSql]] unrolls the 4 rounds).
  *
  * Scale shape: the symmetric edge list is materialized ONCE and each
  * round is one equi join (edges ⋈ prev round on the node key) plus one
  * groupBy sum — |E| intermediate volume per round, never all-pairs, no
  * driver-side state. Integer headroom: walks_k grows like λ1^k (λ1 =
  * graph spectral radius ≈ mean degree on these graphs), so 4 rounds
  * keep Σ walks_k·2^(4-k) inside int64 while λ1 < ~10^4 — far above the
  * support-pruned co-occurrence graphs this runs on; for denser graphs
  * lower `Rounds` or pre-scale.
  */
object Katz {

  val Rounds = 4

  /** (node, katz16) for every non-isolated node of the undirected edge
    * list `edges` ((a, b), one row per edge, orientation irrelevant).
    */
  def run(edges: DataFrame, a: String = "a", b: String = "b"): DataFrame = {
    val sym = Iterate.materialize(
      edges.select(col(a).as("u"), col(b).as("v"))
        .union(edges.select(col(b).as("u"), col(a).as("v"))))
    // walks_1 = degree
    var w = sym.groupBy(col("u")).agg(count(lit(1)).as("w"))
      .select(col("u").as("node"), col("w"))
    var acc = w.select(col("node"),
      (col("w") * (1L << (Rounds - 1))).as("katz16"))
    for (k <- 2 to Rounds) {
      w = Iterate.materialize(
        sym.join(w, sym("v") === w("node"))
          .groupBy(sym("u")).agg(sum(col("w")).as("w"))
          .select(col("u").as("node"), col("w")))
      acc = acc.join(w, "node")
        .select(col("node"),
          (col("katz16") + col("w") * (1L << (Rounds - k))).as("katz16"))
    }
    val out = acc.select(col("node"), col("katz16").cast("long").as("katz16"))
    val materialized = Iterate.materialize(out)
    sym.unpersist()
    materialized
  }

  /** DuckDB unroll over CTEs `e(a, b)` (undirected, one row per edge)
    * and `deg(node, dg)` — [[graft.queries.CoGraph.ctes]]'s shapes.
    */
  def oracleSql: String = {
    val rounds = (2 to Rounds).map { k =>
      s"""w$k AS (
         |  SELECT s.u AS node, CAST(sum(p.w) AS BIGINT) AS w
         |  FROM sym s JOIN w${k - 1} p ON p.node = s.v GROUP BY s.u
         |)""".stripMargin
    }.mkString(",\n")
    val terms = (1 to Rounds)
      .map(k => s"w$k.w * ${1L << (Rounds - k)}").mkString(" + ")
    val joins = (2 to Rounds).map(k => s"JOIN w$k USING (node)").mkString(" ")
    s"""sym AS (
       |  SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
       |), w1 AS (
       |  SELECT node, dg AS w FROM deg
       |),
       |$rounds
       |SELECT w1.node, CAST($terms AS BIGINT) AS katz16
       |FROM w1 $joins""".stripMargin
  }
}

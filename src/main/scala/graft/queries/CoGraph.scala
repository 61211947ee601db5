package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** THE support-pruned part co-occurrence graph — one definition for
  * every graph-tier query that rides it (q_triangles,
  * q_clustering_coef, q_assortativity, q_transitivity), oracle CTEs
  * and Spark edge list alike, so the graph definition cannot drift
  * between the queries that claim to describe the same graph (the
  * `minhashBandsSql` / `PageRank.oracleSql` sharing pattern).
  *
  * Parts co-ordered in ≥ 2 orders are connected — the market-basket
  * support threshold that prunes random one-off co-occurrence BEFORE
  * the graph is built, the same pre-sparsification a 100 TB basket
  * graph needs.
  */
private[queries] object CoGraph {

  /** DuckDB CTE chain: `li` (distinct basket items), `e` (support-
    * pruned undirected edges, a < b), `deg` (node degrees, BIGINT).
    */
  val ctes: String =
    """li AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      |), e AS (
      |  SELECT x.l_partkey AS a, y.l_partkey AS b
      |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
      |  WHERE x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |), deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS dg FROM (
      |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
      |  GROUP BY node
      |)""".stripMargin

  /** Support-counted co-occurrence pairs (a, b, sup), a < b, sup >= 2 —
    * the Spark twin of the `e` CTE. r9 shape: per-basket collect_set +
    * ROW-LOCAL pair generation (baskets are bounded, so the C(b,2)
    * fan-out is a constant per order) instead of the r8 positional
    * self-join — the basket group and the pair count are the only two
    * exchanges, no join build, and the pair multiset is identical
    * (items are deduped per order either way; sort_array makes a < b).
    */
  def pairs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
      .select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
          "transform(slice(items, i + 2, size(items)), " +
          "y -> struct(x AS a, y AS b))))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)

  /** The same edge list (a, b) on the Spark side. */
  def edges(s: SparkSession, d: String): DataFrame =
    pairs(s, d).select(col("a"), col("b"))
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed greedy graph matching by local dominance (Hoepman 2004 /
  * Manne-Bisseling: an edge is matched when it is the minimum-weight
  * incident edge of BOTH its endpoints) — the graph-coarsening
  * primitive (multilevel partitioners pair nodes along a matching to
  * halve the graph per level) and the deterministic-parallel form of
  * greedy weighted matching.
  *
  * Weights are the 60-bit md5 of the canonical pair, totally ordered as
  * (h, a, b) — deterministic, data-independent, and identical in the
  * DuckDB oracle. Running local dominance to fixpoint yields EXACTLY
  * the serial greedy matching that scans edges by ascending (h, a, b)
  * (each locally dominant edge is the next greedy pick in its
  * neighborhood — the spec pins this equality); a fixed round budget
  * yields the same deterministic PREFIX of it on both engines. Per
  * round at least every live component's minimum edge is dominant, so
  * components always progress; random-order weights converge in
  * O(log n) rounds expected (adversarial chains degrade to one match
  * per chain per round — raise `rounds` for pathological paths).
  *
  * Scale shape per round: one groupBy-min over the incidence list
  * (min(struct) — partial-aggregable, no window), two equi joins to
  * test dominance at both endpoints, two anti joins to drop matched
  * nodes. Everything keys on node/edge columns; rounds materialize
  * through checkpoints ([[ConnectedComponents]] pattern) so lineage
  * stays flat.
  */
object Matching {

  /** Locally-dominant matching after `rounds` rounds over the
    * undirected simple graph of `edges` (directed input canonicalized,
    * self-loops dropped, duplicates collapsed). Output: (a, b, round)
    * per matched pair, a < b.
    */
  def run(edges: DataFrame, src: String = "src", dst: String = "dst",
      rounds: Int = 6): DataFrame = {
    require(rounds >= 1)
    val e0 = Iterate.materialize(
      edges.select(least(col(src), col(dst)).as("a"),
          greatest(col(src), col(dst)).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
        .withColumn("h", expr("md5p60(concat(a, ':', b))")))
    Iterate.withWidth(edges.sparkSession, e0.count()) { _ =>
      var e = e0
      val doms = Vector.newBuilder[DataFrame]
      for (i <- 1 to rounds) {
        val inc = e.select(col("a").as("node"), col("h"), col("a"), col("b"))
          .union(e.select(col("b").as("node"), col("h"), col("a"), col("b")))
        // per-node argmin incident edge under the (h, a, b) total order
        val sel = inc.groupBy(col("node"))
          .agg(min(struct(col("h"), col("a"), col("b"))).as("m"))
          .select(col("node"), col("m.a").as("ea"), col("m.b").as("eb"))
        val dom = Iterate.materialize(
          e.join(sel, sel("node") === e("a") &&
              sel("ea") === e("a") && sel("eb") === e("b"))
            .select(e("a"), e("b"))
            .join(sel.select(col("node").as("nb"), col("ea").as("ba"),
                col("eb").as("bb")),
              col("nb") === col("b") && col("ba") === col("a") &&
                col("bb") === col("b"))
            .select(col("a"), col("b"), lit(i).as("round")))
        doms += dom
        val matchedNodes = dom.select(col("a").as("node"))
          .union(dom.select(col("b")))
        val prev = e
        e = Iterate.materialize(
          e.join(matchedNodes, e("a") === matchedNodes("node"), "left_anti")
            .join(matchedNodes, e("b") === matchedNodes("node"), "left_anti"))
        if (prev ne e0) prev.unpersist()
      }
      e.unpersist()
      e0.unpersist()
      doms.result().reduce(_ union _)
    }
  }

  /** The same rounds unrolled as DuckDB SQL over a `graft_edges`
    * (src, dst) relation — the oracle twin of [[run]]; ends selecting
    * (a, b, round). The per-node argmin is a row_number window (the
    * oracle may sort; the engine side uses the partial-aggregable
    * min(struct) — same (h, a, b) total order, same pick).
    */
  def oracleSql(rounds: Int = 6): String = {
    val sb = new StringBuilder
    sb.append(
      """e1 AS MATERIALIZED (
        |  SELECT a, b,
        |    CAST(concat('0x', substr(md5(a || ':' || b), 1, 15)) AS BIGINT)
        |      AS h
        |  FROM (
        |    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |    FROM graft_edges WHERE src <> dst)
        |)""".stripMargin)
    for (i <- 1 to rounds) {
      sb.append(
        s""",
           |inc$i AS (
           |  SELECT a AS node, h, a, b FROM e$i
           |  UNION ALL SELECT b, h, a, b FROM e$i
           |), sel$i AS (
           |  SELECT node, a AS ea, b AS eb FROM (
           |    SELECT node, a, b, row_number() OVER (PARTITION BY node
           |      ORDER BY h, a, b) AS rn
           |    FROM inc$i) WHERE rn = 1
           |), dom$i AS MATERIALIZED (
           |  SELECT e.a, e.b FROM e$i e
           |  JOIN sel$i ma ON ma.node = e.a AND ma.ea = e.a AND ma.eb = e.b
           |  JOIN sel$i mb ON mb.node = e.b AND mb.ea = e.a AND mb.eb = e.b
           |), mn$i AS (
           |  SELECT a AS node FROM dom$i UNION SELECT b FROM dom$i
           |), e${i + 1} AS MATERIALIZED (
           |  SELECT e.* FROM e$i e
           |  WHERE NOT EXISTS (SELECT 1 FROM mn$i m WHERE m.node = e.a)
           |    AND NOT EXISTS (SELECT 1 FROM mn$i m WHERE m.node = e.b)
           |)""".stripMargin)
    }
    sb.append("\n")
    sb.append((1 to rounds)
      .map(i => s"SELECT a, b, $i AS round FROM dom$i")
      .mkString("", "\nUNION ALL\n", ""))
    sb.toString
  }
}

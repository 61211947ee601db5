package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition by iterative support peeling: repeatedly drop
  * every edge contained in fewer than k−2 triangles of the LIVE graph,
  * until stable — the edge-grade sibling of [[KCore]]'s node peeling
  * (a k-truss is a subgraph where every tie is embedded in dense mutual
  * neighborhoods; the standard community-core / spam-filter gate one
  * notch stricter than k-core).
  *
  * Determinism: pure set algebra (integer supports), so exact on any
  * engine; the round count is FIXED (the [[KCore]] convention) so the
  * oracle can unroll identical rounds — `KTrussSpec` asserts fixtures
  * reach the fixpoint within the configured rounds.
  *
  * Scale shape: per round, one degree-ordered triangle enumeration over
  * the live edges ([[Triangles.triangles]] — wedge fan-out bounded
  * O(sqrt m) per node), an explode-3 + groupBy for per-edge supports,
  * and one semi join back; the edge set only shrinks, rounds
  * materialize through checkpoints. The oracle counts supports the
  * OTHER way (symmetric-closure common-neighbor join) — two independent
  * algorithms for the same set, the SccSpec convention.
  */
object KTruss {

  /** Surviving edges (a < b) of the k-truss after `rounds` peels of the
    * undirected (a, b) edge frame.
    */
  def trussEdges(edges: DataFrame, k: Int, rounds: Int = 6): DataFrame = {
    require(k >= 3 && rounds >= 1)
    var e = Iterate.materialize(
      edges.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct())
    // early exit at the fixpoint: next ⊆ e always, so an unchanged COUNT
    // is an unchanged SET and every later round is a no-op (the oracle
    // unrolls all rounds — identical values either way). Every round
    // materializes (Cadence(every=1) shape) because the count probe
    // would otherwise re-execute the triangle join
    val cadence = new Iterate.Cadence(e, every = 1)
    var prev = e.count()
    var done = false
    for (i <- 1 to rounds if !done) {
      val sup = Triangles.triangles(e)
        .select(explode(array(
          struct(least(col("x"), col("y")).as("a"),
            greatest(col("x"), col("y")).as("b")),
          struct(least(col("x"), col("z")).as("a"),
            greatest(col("x"), col("z")).as("b")),
          struct(least(col("y"), col("z")).as("a"),
            greatest(col("y"), col("z")).as("b")))).as("ed"))
        .select(col("ed.a").as("a"), col("ed.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= k - 2)
        .select(col("a"), col("b"))
      val next = e.join(sup, Seq("a", "b"), "left_semi")
      e = cadence.step(i, i == rounds, next)
      val cnt = e.count()
      if (cnt == prev) done = true
      prev = cnt
    }
    e
  }

  /** The same peels unrolled as DuckDB SQL over a `graft_und_edges`
    * (a, b) CTE, supports counted by symmetric-closure common-neighbor
    * joins — ends selecting (a, b).
    */
  def oracleSql(k: Int, rounds: Int = 6): String = {
    val sb = new StringBuilder
    sb.append(
      """t0 AS MATERIALIZED (
        |  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
        |  FROM graft_und_edges WHERE a <> b
        |)""".stripMargin)
    for (i <- 1 to rounds) {
      sb.append(
        s""",
           |u$i AS (
           |  SELECT a, b FROM t${i - 1}
           |  UNION ALL SELECT b, a FROM t${i - 1}
           |), t$i AS MATERIALIZED (
           |  SELECT e.a, e.b FROM t${i - 1} e
           |  JOIN u$i f ON f.a = e.a
           |  JOIN u$i g ON g.a = e.b AND g.b = f.b
           |  GROUP BY e.a, e.b HAVING count(*) >= ${k - 2}
           |)""".stripMargin)
    }
    sb.append(s"\nSELECT a, b FROM t$rounds")
    sb.toString
  }
}

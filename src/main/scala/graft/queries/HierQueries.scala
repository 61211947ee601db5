package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Tables

/** Hierarchical (recursive-CTE) analytics — the org-chart / bill-of-
  * materials rollup family, run on Spark 4's native `WITH RECURSIVE`
  * (SPARK-24497, `UnionLoop`). The reference engine family covers this
  * via warehouse SQL; here BOTH engines execute the SAME recursive SQL
  * text (only the table identifier differs), so the oracle compare also
  * pins Spark's recursion semantics against DuckDB's.
  *
  * The hierarchy is derived, not stored: parent(k) = floor(k / 4), root
  * 0 — a deterministic 4-ary tree over `part` (every engine computes the
  * same tree, no fixture needed). Depth is log4(n): 4 levels at sf0.001,
  * ~14 levels at 200M parts.
  *
  * Scale shape: the recursive step is a NARROW projection+filter on the
  * previous iteration's frontier (no join inside the loop — the walk
  * carries (node, current-ancestor) pairs upward), so each of the
  * log4(n) iterations is a map over ≤ n rows; total intermediate volume
  * n·log4(n). The rollup join + hash aggregation happen ONCE, after the
  * loop. No driver-side convergence check — termination is the WHERE
  * inside the recursion.
  *
  * Cross-engine exactness: parent steps are `CAST(floor(anc / 4.0) AS
  * BIGINT)` — `/` is a correctly-rounded double divide in both engines
  * and partkeys stay far below 2^52, so floor is exact; money sums use
  * the fixed-point [[Num]] construction.
  */
object HierQueries {

  /** Subtree rollup: for every node, the size and total retail value of
    * the subtree rooted there (every node aggregates itself + all
    * descendants). The recursion walks each node's ancestor chain to the
    * root; grouping the walk by ancestor inverts it into per-subtree
    * aggregation without ever materializing descendant lists.
    */
  private def subtreeSql(part: String): String =
    s"""WITH RECURSIVE walk AS (
       |  SELECT p_partkey AS node, p_partkey AS anc FROM $part
       |  UNION ALL
       |  SELECT node, CAST(floor(anc / 4.0) AS BIGINT) AS anc
       |  FROM walk WHERE anc > 0
       |)
       |SELECT anc AS p_partkey, count(*) AS n_subtree,
       |  ${Num.dsum2Sql("p.p_retailprice")} AS subtree_value
       |FROM walk JOIN $part p ON walk.node = p.p_partkey
       |GROUP BY anc""".stripMargin

  /** Materialized-path labelling (ltree-style): every part's root-to-node
    * path `0/…/k` plus its depth, built by prepending the parent at each
    * recursive step. String accumulation inside recursion exercises a
    * different UnionLoop shape than the integer walk (growing payload,
    * same narrow per-iteration plan).
    */
  private def pathSql(part: String): String =
    s"""WITH RECURSIVE p AS (
       |  SELECT p_partkey AS node, p_partkey AS cur,
       |    CAST(p_partkey AS STRING) AS path, 0 AS depth
       |  FROM $part
       |  UNION ALL
       |  SELECT node, CAST(floor(cur / 4.0) AS BIGINT) AS cur,
       |    concat(CAST(CAST(floor(cur / 4.0) AS BIGINT) AS STRING), '/', path) AS path,
       |    depth + 1 AS depth
       |  FROM p WHERE cur > 0
       |)
       |SELECT node AS p_partkey, depth, path
       |FROM p WHERE cur = 0""".stripMargin

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql("q_subtree_rollup_cte", subtreeSql("part")) { (s, d) =>
      Tables.part(s, d).createOrReplaceTempView("graft_hier_part_v")
      s.sql(subtreeSql("graft_hier_part_v"))
    },

    QueryDef.sql("q_hier_path", pathSql("part")) { (s, d) =>
      Tables.part(s, d).createOrReplaceTempView("graft_hier_part_v")
      s.sql(pathSql("graft_hier_part_v"))
    }
  )
}

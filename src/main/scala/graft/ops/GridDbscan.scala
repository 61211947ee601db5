package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-based DBSCAN — density clustering at corpus scale: snap points
  * to an eps-sized grid, call a cell "core" when it holds >= minPts
  * points, connect adjacent core cells (8-neighborhood) into clusters,
  * attach points in non-core cells that touch a core cell as border
  * points, and mark the rest noise.
  *
  * This is the grid variant of DBSCAN (cell density instead of
  * per-point eps-balls): the variant that scales, because density is
  * ONE linear groupBy over cell keys, cluster formation runs on the
  * (tiny) occupied-core-cell graph via [[ConnectedComponents]], and no
  * point-to-point distance is ever computed — there is no all-pairs
  * anything at any corpus size. The classic refinement (exact eps-ball
  * checks within neighbor cells) would add one bounded cell-local join;
  * the cell-resolution approximation is the documented semantics here.
  *
  * Determinism: cells are floor(p/eps) on correctly-rounded doubles,
  * adjacency is integer, cluster ids are the lexicographic min cell key
  * of the component, and a border cell touching two distinct clusters
  * resolves to the min cluster id — every step is engine-independent,
  * so the DuckDB oracle reproduces the clustering exactly.
  */
object GridDbscan {

  /** Cluster `pts` (columns: id, px, py). Output: (id, cluster, role)
    * with role in {'core','border','noise'} and cluster = min cell key
    * "cx:cy" of the connected core component ('-1' for noise).
    */
  def cluster(pts: DataFrame, eps: Double, minPts: Long): DataFrame = {
    val spark = pts.sparkSession
    import spark.implicits._
    val cells = pts.select(col("id"),
      floor(col("px") / lit(eps)).cast("long").as("cx"),
      floor(col("py") / lit(eps)).cast("long").as("cy"))
    val occ = cells.groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n"))
    def key(cx: org.apache.spark.sql.Column, cy: org.apache.spark.sql.Column) =
      concat(cx.cast("string"), lit(":"), cy.cast("string"))
    val core = occ.filter(col("n") >= minPts)
      .select(col("cx"), col("cy"), key(col("cx"), col("cy")).as("c"))
    val offsets = Seq(-1L, 0L, 1L)
      .flatMap(dx => Seq(-1L, 0L, 1L).map(dy => (dx, dy)))
      .toDF("dx", "dy")
    // adjacency among core cells: 9-offset explode + equi-join — the
    // frame is occupied-core-cells-sized, never point-sized
    val shifted = core.crossJoin(broadcast(offsets))
      .select((col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"),
        col("c").as("c_from"))
    val edges = shifted.join(core, Seq("cx", "cy"))
      .select(col("c_from").as("src"), col("c").as("dst"))
      .filter(col("src") =!= col("dst"))
    val comp = ConnectedComponents.run(edges) // (id = cell key, rep)
    // isolated core cells (no core neighbor) are their own cluster
    val coreClust = core.join(comp, core("c") === comp("id"), "left")
      .select(col("cx"), col("cy"), col("c"),
        coalesce(col("rep"), col("c")).as("cluster"))
    // per point: min cluster over the 9 surrounding cells' core entries
    val nbr = cells.crossJoin(broadcast(offsets))
      .select(col("id"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"),
        (col("dx") === 0 && col("dy") === 0).as("own"))
      .join(coreClust.select(col("cx"), col("cy"), col("cluster")),
        Seq("cx", "cy"))
      .groupBy(col("id"))
      .agg(min(col("cluster")).as("cluster"),
        max(when(col("own"), lit(1)).otherwise(lit(0))).as("in_core"))
    pts.select(col("id")).join(nbr, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster"), lit("-1")).as("cluster"),
        when(col("in_core") === 1, lit("core"))
          .when(col("cluster").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"))
  }

  /** The identical clustering as DuckDB CTEs over a `graft_pts`
    * (id, px, py) relation — the oracle twin of [[cluster]]. Needs
    * WITH RECURSIVE (the component closure).
    */
  def oracleSql(eps: String, minPts: Long): String =
    s"""cells AS MATERIALIZED (
       |  SELECT id, CAST(floor(px / $eps) AS BIGINT) AS cx,
       |         CAST(floor(py / $eps) AS BIGINT) AS cy
       |  FROM graft_pts
       |), occ AS (
       |  SELECT cx, cy, count(*) AS n FROM cells GROUP BY cx, cy
       |), core AS MATERIALIZED (
       |  SELECT cx, cy, CAST(cx AS VARCHAR) || ':' || CAST(cy AS VARCHAR) AS c
       |  FROM occ WHERE n >= $minPts
       |), offs AS (
       |  SELECT dx.v AS dx, dy.v AS dy
       |  FROM (VALUES (-1), (0), (1)) dx(v), (VALUES (-1), (0), (1)) dy(v)
       |), cedge AS (
       |  SELECT a.c AS u, b.c AS v
       |  FROM core a CROSS JOIN offs
       |  JOIN core b ON b.cx = a.cx + offs.dx AND b.cy = a.cy + offs.dy
       |  WHERE a.c <> b.c
       |), reach(id, r) AS (
       |  SELECT u, u FROM cedge
       |  UNION
       |  SELECT e.u, reach.r FROM cedge e JOIN reach ON reach.id = e.v
       |), comp AS (
       |  SELECT id, min(r) AS rep FROM reach GROUP BY id
       |), cclust AS MATERIALIZED (
       |  SELECT core.cx, core.cy, COALESCE(comp.rep, core.c) AS cluster
       |  FROM core LEFT JOIN comp ON comp.id = core.c
       |), nbr AS (
       |  SELECT cells.id, min(cclust.cluster) AS cluster,
       |    max(CASE WHEN offs.dx = 0 AND offs.dy = 0 THEN 1 ELSE 0 END) AS in_core
       |  FROM cells CROSS JOIN offs
       |  JOIN cclust ON cclust.cx = cells.cx + offs.dx
       |             AND cclust.cy = cells.cy + offs.dy
       |  GROUP BY cells.id
       |)
       |SELECT p.id, COALESCE(nbr.cluster, '-1') AS cluster,
       |  CASE WHEN nbr.in_core = 1 THEN 'core'
       |       WHEN nbr.cluster IS NOT NULL THEN 'border'
       |       ELSE 'noise' END AS role
       |FROM graft_pts p LEFT JOIN nbr ON nbr.id = p.id""".stripMargin
}

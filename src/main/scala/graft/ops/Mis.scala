package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal independent set by deterministic Luby rounds — the classic
  * O(log n)-round symmetry-breaking primitive (scheduling conflict-free
  * work over a conflict graph, seeding diverse exemplars, distributed
  * graph coloring's first color class).
  *
  * Each round, a live node joins the MIS iff its priority beats every
  * live neighbor's; winners and their neighbors leave the graph.
  * Priorities are md5-derived integers (the repo's md5p60 convention) —
  * Luby's randomness replaced by a deterministic hash so the result is
  * exact on any engine and oracle-replayable; ties (astronomically rare
  * 60-bit collisions) break by node id, making the comparison a strict
  * total order, which is what guarantees independence within a round.
  * Isolated live nodes have no neighbors to lose to and self-select.
  *
  * Round count is FIXED (the [[KCore]] convention) so the oracle can
  * unroll identical rounds; `MisSpec` asserts fixtures empty the live
  * set within them (expected O(log n); the md5 priorities behave as
  * Luby's random ones).
  *
  * Scale shape: per round, one grouped count of better-priority live
  * neighbors (equi joins on the symmetric edge list) + two anti joins
  * to shrink the live set; everything keyed, no windows, the live
  * frame only shrinks; rounds materialize through checkpoints.
  */
object Mis {

  private val prio = "md5p60(CAST(node AS STRING))"

  /** MIS of the undirected (a, b) edge frame (isolated nodes of the
    * frame's endpoint set are by definition included). Output:
    * (node, round) — the Luby round that selected each member.
    */
  def select(edges: DataFrame, rounds: Int = 8): DataFrame = {
    require(rounds >= 1)
    val spark = edges.sparkSession
    // checkpoint the edge frame BEFORE deriving the live-node set: both
    // read it, and un-checkpointed the (often expensive) edge build ran
    // twice (measured as two identical 12 MB-write stages in q_mis)
    val e0 = Iterate.materialize(
      edges.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct())
    var live = Iterate.materialize(
      e0.select(col("a").as("node")).union(e0.select(col("b")))
        .distinct()
        .withColumn("p", expr(prio)))
    var e = e0
    var out: DataFrame = null
    // every round materializes (Cadence(every=1)) so the live-set
    // emptiness probe — the early exit once everything is selected or
    // removed; later rounds are no-ops — reads checkpointed data
    val liveCad = new Iterate.Cadence(live, every = 1)
    val eCad = new Iterate.Cadence(e, every = 1)
    var done = false
    for (i <- 1 to rounds if !done) {
      val und = e.select(col("a").as("n"), col("b").as("m"))
        .unionAll(e.select(col("b").as("n"), col("a").as("m")))
      // count live neighbors that beat (p, id) — selected iff none
      val beat = und
        .join(live.select(col("node").as("n"), col("p").as("pn")), "n")
        .join(live.select(col("node").as("m"), col("p").as("pm")), "m")
        .filter(col("pm") < col("pn") ||
          (col("pm") === col("pn") && col("m") < col("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("c"))
      val sel = live
        .join(beat.select(col("n").as("node"), col("c")), Seq("node"), "left")
        .filter(coalesce(col("c"), lit(0L)) === 0L)
        .select(col("node"))
      val selRound = sel.withColumn("round", lit(i))
      out = if (out == null) Iterate.materialize(selRound)
        else Iterate.materialize(out.unionAll(selRound))
      val removed = sel
        .unionAll(und.join(sel.select(col("node").as("n")), Seq("n"))
          .select(col("m").as("node")))
        .distinct()
      live = liveCad.step(i, i == rounds,
        live.join(removed, Seq("node"), "left_anti"))
      val lv = live.select(col("node"))
      e = eCad.step(i, i == rounds,
        e.join(lv.select(col("node").as("a")), Seq("a"), "left_semi")
          .join(lv.select(col("node").as("b")), Seq("b"), "left_semi")
          .select(col("a"), col("b")))
      if (live.isEmpty) done = true
    }
    out
  }

  /** The same rounds unrolled as DuckDB SQL over a `graft_und_edges`
    * (a, b) CTE — ends selecting (node, round).
    */
  def oracleSql(rounds: Int = 8): String = {
    val sb = new StringBuilder
    sb.append(
      """me0 AS MATERIALIZED (
        |  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
        |  FROM graft_und_edges WHERE a <> b
        |), ml0 AS MATERIALIZED (
        |  SELECT node, CAST(concat('0x',
        |    substr(md5(CAST(node AS VARCHAR)), 1, 15)) AS BIGINT) AS p
        |  FROM (SELECT a AS node FROM me0 UNION SELECT b FROM me0)
        |)""".stripMargin)
    for (i <- 1 to rounds) {
      val j = i - 1
      sb.append(
        s""",
           |mu$i AS (SELECT a AS n, b AS m FROM me$j
           |  UNION ALL SELECT b, a FROM me$j),
           |ms$i AS MATERIALIZED (
           |  SELECT l.node FROM ml$j l LEFT JOIN (
           |    SELECT u.n AS node, count(*) AS c FROM mu$i u
           |    JOIN ml$j x ON x.node = u.n
           |    JOIN ml$j y ON y.node = u.m
           |    WHERE y.p < x.p OR (y.p = x.p AND u.m < u.n)
           |    GROUP BY u.n) b USING (node)
           |  WHERE COALESCE(b.c, 0) = 0
           |), ml$i AS MATERIALIZED (
           |  SELECT * FROM ml$j WHERE node NOT IN (
           |    SELECT node FROM ms$i
           |    UNION SELECT u.m FROM mu$i u JOIN ms$i s ON s.node = u.n)
           |), me$i AS MATERIALIZED (
           |  SELECT a, b FROM me$j
           |  WHERE a IN (SELECT node FROM ml$i)
           |    AND b IN (SELECT node FROM ml$i)
           |)""".stripMargin)
    }
    sb.append("\n" + (1 to rounds)
      .map(i => s"SELECT node, $i AS round FROM ms$i")
      .mkString("\nUNION ALL "))
    sb.toString
  }
}

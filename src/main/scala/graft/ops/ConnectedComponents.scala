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

  /** Total order identical to Spark's own min() over the supported node
    * types (integral compare; strings by UTF8 binary order, which is
    * what Spark's UTF8String comparison uses — NOT java.lang.String's
    * UTF-16 code-unit order).
    */
  private[ops] def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => Integer.compare(x, y)
    case (x: String, y: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))
    case _ => throw new IllegalArgumentException(
      s"unsupported node type: ${a.getClass} vs ${b.getClass}")
  }

  /** Node types [[cmpAny]] orders identically to Spark's min(). A frame
    * with any other id type skips the local tail and finishes through
    * the distributed star rounds (which order everything natively). */
  private[ops] def localTypeOk(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.StringType => true
      case _ => false
    }

  /** Edge-count bound under which the contraction finishes locally —
    * an ABSOLUTE driver-memory bound (2^17 edges ~ a few MB collected:
    * the same order as a broadcast-join build side), not a knob tuned
    * to the local core count. Override: `spark.graft.cc.localEdges`
    * (0 disables the local tail).
    */
  private def localLimit(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("spark.graft.cc.localEdges")
      .map(_.toLong).getOrElse(1L << 17)

  /** Driver-local union-find over a collected edge frame — the
    * contraction TAIL (guide §1.2: per-round fixed cost dominates once
    * the live graph is tiny; a graph under [[localLimit]] edges is
    * latency-bound through the distributed rounds, metadata-sized for
    * the driver). Output rows are EXACTLY [[run]]'s fixpoint contract:
    * (id, rep = minimum node of the component) for every node present
    * in an edge — same values at any parallelism, so the switch is
    * invisible to every caller and to the oracles.
    */
  private def runLocal(cur: DataFrame): DataFrame = {
    val spark = cur.sparkSession
    val rows = cur.collect()
    val idx = new java.util.HashMap[Any, Integer]()
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Any]
    def id(v: Any): Int = {
      val got = idx.get(v)
      if (got == null) {
        idx.put(v, Integer.valueOf(nodes.length)); nodes += v
        nodes.length - 1
      } else got.intValue
    }
    val parent = scala.collection.mutable.ArrayBuffer.empty[Int]
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    rows.foreach { r =>
      val a = id(r.get(0)); val b = id(r.get(1))
      while (parent.length < nodes.length) parent += parent.length
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(rb) = ra
    }
    // component representative = minimum member (cmpAny == Spark min)
    val repOf = new java.util.HashMap[Int, Any]()
    var i = 0
    while (i < nodes.length) {
      val r = find(i)
      val cand = nodes(i)
      val cu = repOf.get(r)
      if (cu == null || cmpAny(cand, cu) < 0) repOf.put(r, cand)
      i += 1
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](nodes.length)
    i = 0
    while (i < nodes.length) {
      out.add(org.apache.spark.sql.Row(nodes(i), repOf.get(find(i))))
      i += 1
    }
    val t = cur.schema.fields(0).dataType
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", t, nullable = false),
      org.apache.spark.sql.types.StructField("rep", t, nullable = false))))
  }

  /** Component membership for every node present in `edges`:
    * (id, rep) with rep = minimum node id of the component. Nodes that
    * appear in no edge are absent (singletons are the caller's
    * left-join default, see `q_dedup_cc`). Deterministic at any
    * parallelism; throws if `maxIter` rounds don't reach the fixpoint
    * (provably impossible below O(log^2 n) rounds).
    *
    * Hybrid tail (r9): once the live edge frame is under
    * [[localLimit]] rows — at entry, or after any contraction round —
    * the remaining rounds collapse into one driver-local union-find
    * ([[runLocal]]), the standard multi-level-contraction endgame. The
    * distributed star rounds still carry anything larger; results are
    * bit-identical either way.
    */
  def run(
      edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIter: Int = 25): DataFrame = {
    val limit0 = localLimit(edges.sparkSession)
    var cur = materialize(
      edges.select(col(src).as("src"), col(dst).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct())
    // unsupported id types (decimal/date/short...) disable the tail
    // rather than throw mid-contraction — the star rounds carry them
    val limit =
      if (localTypeOk(cur.schema.fields(0).dataType)) limit0 else -1L
    var sig = signature(cur)
    if (sig._1 <= limit) {
      val out = runLocal(cur)
      cur.unpersist()
      return out
    }
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
      if (!converged && nsig._1 <= limit) {
        val out = runLocal(cur)
        cur.unpersist()
        return out
      }
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

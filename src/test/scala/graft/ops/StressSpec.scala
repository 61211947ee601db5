package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Stress centrality against hand-counted paths and an independent
  * σ_s(v)·σ_v(t) distance-decomposition reference (Floyd-Warshall
  * distances + path-count DP) on random graphs.
  */
class StressSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(
      edges: Set[(Long, Long)], seeds: Seq[Long], maxHops: Int = 4) =
    Stress.run(edges.toSeq.toDF("a", "b"), seeds.toDF("node"), maxHops)
      .as[(Long, Long)].collect().toMap

  /** Independent reference: d via Floyd-Warshall, σ(u,v) path counts by
    * DP over increasing distance, stress(v) = Σ over (s in seeds,
    * t != s,v): σ(s,v)·σ(v,t) where d(s,v)+d(v,t) = d(s,t) <= the same
    * truncation the distributed pass applies (d(s,v) <= maxHops and
    * d(s,t) <= maxHops: every counted path lives inside the truncated
    * BFS DAG).
    */
  private def reference(
      edges: Set[(Long, Long)], seeds: Seq[Long], maxHops: Int)
      : Map[Long, Long] = {
    val nodes = edges.flatMap { case (a, b) => Set(a, b) }.toSeq.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.size
    val INF = Int.MaxValue / 4
    val d = Array.fill(n, n)(INF)
    for (i <- 0 until n) d(i)(i) = 0
    for ((a, b) <- edges; if a != b) {
      d(idx(a))(idx(b)) = 1; d(idx(b))(idx(a)) = 1
    }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (d(i)(k) + d(k)(j) < d(i)(j)) d(i)(j) = d(i)(k) + d(k)(j)
    // σ(u, v): DP over distance
    val sig = Array.fill(n, n)(0L)
    for (u <- 0 until n) {
      sig(u)(u) = 1L
      for (dist <- 1 to n; v <- 0 until n; if d(u)(v) == dist) {
        var s = 0L
        for ((a, b) <- edges; (x, y) <- Seq((idx(a), idx(b)), (idx(b), idx(a)))
             if y == v && d(u)(x) == dist - 1) s += sig(u)(x)
        sig(u)(v) = s
      }
    }
    val st = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (s <- seeds.map(idx); v <- 0 until n; t <- 0 until n)
      if (v != s && v != t && t != s &&
        d(s)(v) + d(v)(t) == d(s)(t) &&
        d(s)(v) <= maxHops && d(s)(t) <= maxHops &&
        d(s)(v) < INF && d(v)(t) < INF)
        st(nodes(v)) += sig(s)(v) * sig(v)(t)
    st.filter(_._2 > 0).toMap
  }

  test("path graph: interior nodes carry descending through-traffic") {
    val path = Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    run(path, Seq(1L)) shouldBe Map(2L -> 3L, 3L -> 2L, 4L -> 1L)
  }

  test("diamond: both middle nodes carry one path each, the sink none") {
    val diamond = Set((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    run(diamond, Seq(1L)) shouldBe Map(2L -> 1L, 3L -> 1L)
  }

  test("two seeds sum: both path endpoints as seeds") {
    val path = Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    run(path, Seq(1L, 5L)) shouldBe Map(2L -> 4L, 3L -> 4L, 4L -> 4L)
  }

  test("matches the distance-decomposition reference on a random graph") {
    val rnd = new scala.util.Random(17)
    val edges = (0 until 60).map { _ =>
      val a = rnd.nextInt(18).toLong; val b = rnd.nextInt(18).toLong; (a, b)
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val seeds = Seq(0L, 5L, 11L).filter(s =>
      edges.exists { case (a, b) => a == s || b == s })
    run(edges, seeds) shouldBe reference(edges, seeds, 4)
  }
}

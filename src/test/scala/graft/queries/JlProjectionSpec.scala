package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Quality contract of the q_project_embeddings JL projection: random
  * projection must preserve SEPARATION — points from the same cluster
  * stay much closer to each other than points from different clusters
  * after 64 -> 16 dims. (Pairwise-rank preservation on the near-random
  * driver corpus is meaningless — all pairs are near-equidistant — so
  * the spec uses a clustered corpus; value correctness is pinned by the
  * oracle gate.)
  */
class JlProjectionSpec extends AnyFunSuite with Matchers {

  /** The plane family of q_project_embeddings (j offset by 64), applied
    * locally: component i (1-based) of plane j is
    * (((i*(1000003+(j+64)*7919)) + ((j+64)*271+17)) % 1000) * 1e-3 - 0.5.
    */
  private def project(x: Array[Double]): Array[Double] =
    Array.tabulate(16) { j =>
      val jj = j + 64
      var acc = 0.0
      var i = 0
      while (i < x.length) {
        val plane = (((i + 1).toLong * (1000003 + jj * 7919) + (jj * 271 + 17)) % 1000L) * 1e-3 - 5e-1
        acc += x(i) * plane
        i += 1
      }
      acc / 4.0
    }

  private def dist(a: Array[Double], b: Array[Double]): Double =
    math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)

  test("clustered 64-dim corpus stays separated after 64 -> 16 projection") {
    // 8 well-separated clusters (disjoint active coordinate blocks),
    // deterministic noise — same construction as IvfRecallSpec
    val rows = (0 until 200).map { i =>
      val c = i % 8
      val v = Array.tabulate(64) { j =>
        val base = if (j >= 8 * c && j < 8 * (c + 1)) 1.0 else 0.0
        base + (((i * 31 + j * 17) % 101) - 50) / 1000.0
      }
      (c, v)
    }
    val proj = rows.map { case (c, v) => (c, project(v)) }
    val ds = for {
      ((c1, p1), i) <- proj.zipWithIndex
      ((c2, p2), j) <- proj.zipWithIndex if i < j
    } yield (c1 == c2, dist(p1, p2))
    val within = ds.collect { case (true, d) => d }
    val between = ds.collect { case (false, d) => d }
    val meanW = within.sum / within.size
    val meanB = between.sum / between.size
    withClue(s"within=$meanW between=$meanB") {
      meanB should be > meanW * 2.0
    }
  }
}

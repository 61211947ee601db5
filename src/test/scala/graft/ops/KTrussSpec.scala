package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** k-truss peeling against hand graphs (including a multi-round
  * cascade), a brute-force serial reference on random graphs, and the
  * fixpoint guarantee at the configured round count.
  */
class KTrussSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int = 6)
      : Set[(Long, Long)] =
    KTruss.trussEdges(edges.toDF("a", "b"), k, rounds)
      .as[(Long, Long)].collect().toSet

  /** Serial reference: recompute common-neighbor supports and peel
    * until stable.
    */
  private def serial(edges: Seq[(Long, Long)], k: Int): Set[(Long, Long)] = {
    var e = edges.filter(p => p._1 != p._2)
      .map(p => (p._1 min p._2, p._1 max p._2)).toSet
    var changed = true
    while (changed) {
      val nbr = e.toSeq.flatMap(p => Seq(p, p.swap))
        .groupBy(_._1).map { case (n, ps) => n -> ps.map(_._2).toSet }
      val next = e.filter { case (a, b) =>
        (nbr(a) & nbr(b)).size >= k - 2
      }
      changed = next != e
      e = next
    }
    e
  }

  test("triangle survives 3-truss; pendant and chain edges peel") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (1, 3), // triangle
      (3, 4), (4, 5)) // chain hanging off it
    run(edges, k = 3) shouldBe Set((1L, 2L), (2L, 3L), (1L, 3L))
  }

  test("4-truss cascade needs multiple rounds: bowtie of two triangles") {
    // K4 minus one edge: triangles (1,2,3) and (2,3,4) share edge (2,3).
    // Supports: (2,3)=2, all others=1 -> 4-truss peels the four outer
    // edges in round 1, which strands (2,3) (support drops to 0) — the
    // multi-round cascade.
    val edges = Seq[(Long, Long)]((1, 2), (1, 3), (2, 3), (2, 4), (3, 4))
    run(edges, k = 4) shouldBe Set.empty
    // whereas K4 itself (every edge support 2) is a 4-truss
    val k4 = edges :+ ((1L, 4L))
    run(k4, k = 4) shouldBe
      Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
  }

  test("matches the serial peel-to-fixpoint on random graphs, k = 3 and 4") {
    val rnd = new scala.util.Random(41)
    val edges = (0 until 300).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
    }.filter(p => p._1 != p._2)
    run(edges, k = 3) shouldBe serial(edges, k = 3)
    run(edges, k = 4) shouldBe serial(edges, k = 4)
  }

  test("fixpoint within configured rounds: an extra round changes nothing") {
    val rnd = new scala.util.Random(42)
    val edges = (0 until 200).map { _ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)
    }.filter(p => p._1 != p._2)
    run(edges, k = 3, rounds = 6) shouldBe run(edges, k = 3, rounds = 7)
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Boruvka MSF against serial Kruskal (the independent algorithm the
  * oracle uses) on hand graphs and random weighted graphs with heavy
  * ties, plus the structural invariants (|MSF| = n − #components, no
  * cycles, spans every component).
  */
class MstSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], rounds: Int = 12)
      : Set[(Long, Long, Long)] =
    Mst.forest(edges.toDF("a", "b", "w"), rounds)
      .as[(Long, Long, Long)].collect().toSet

  /** Serial Kruskal under the same (w, a, b) order. */
  private def kruskal(edges: Seq[(Long, Long, Long)])
      : Set[(Long, Long, Long)] = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => ((e._1 min e._2, e._1 max e._2), e._3))
      .groupBy(_._1).map { case (k, vs) => (k._1, k._2, vs.map(_._2).min) }
      .toSeq.sortBy(e => (e._3, e._1, e._2))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    canon.filter { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra == rb) false else { parent(ra max rb) = ra min rb; true }
    }.toSet
  }

  test("hand graph: cheapest edges win, tie broken by (a, b)") {
    val edges = Seq[(Long, Long, Long)](
      (1, 2, 4), (2, 3, 1), (1, 3, 2), (3, 4, 7), (2, 4, 7), (5, 6, 1))
    val got = run(edges)
    got shouldBe Set((2L, 3L, 1L), (1L, 3L, 2L), (2L, 4L, 7L), (5L, 6L, 1L))
    got shouldBe kruskal(edges)
  }

  test("matches serial Kruskal on random graphs with heavy weight ties") {
    val rnd = new scala.util.Random(29)
    val edges = (0 until 500).map { _ =>
      (rnd.nextInt(70).toLong, rnd.nextInt(70).toLong,
        rnd.nextInt(5).toLong + 1) // only 5 distinct weights: tie storm
    }.filter(e => e._1 != e._2)
    run(edges) shouldBe kruskal(edges)
  }

  test("structural invariants: acyclic, spanning, n - c edges") {
    val rnd = new scala.util.Random(31)
    val edges = (0 until 300).map { _ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong,
        rnd.nextInt(1000).toLong)
    }.filter(e => e._1 != e._2)
    val msf = run(edges)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    // component count via union-find over ALL edges
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { e =>
      val (ra, rb) = (find(e._1), find(e._2))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val comps = nodes.map(find).size
    msf.size shouldBe nodes.size - comps
    // forest edges connect exactly the same components (spanning +
    // acyclic together force equality with Kruskal's count, but check
    // connectivity independently: MSF reaches every node)
    msf.flatMap(e => Seq(e._1, e._2)) ++ nodes.filter(n =>
      !edges.exists(e => e._1 == n || e._2 == n)) should
      contain theSameElementsAs nodes
  }

  test("total weight equals Kruskal's even when edge sets could differ") {
    val rnd = new scala.util.Random(37)
    val edges = (0 until 400).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong,
        rnd.nextInt(3).toLong + 1)
    }.filter(e => e._1 != e._2)
    run(edges).toSeq.map(_._3).sum shouldBe
      kruskal(edges).toSeq.map(_._3).sum
  }
}

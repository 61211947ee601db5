package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** h-index coreness iteration against budget-free serial peeling (the
  * DEFINITION: coreness(v) = the k of the deepest core containing v),
  * hand graphs, and the fixpoint-within-budget guarantee.
  */
class CorenessSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int = 28)
      : Map[Long, Long] =
    Coreness.run(edges.toDF("a", "b"), rounds)
      .as[(Long, Long)].collect().toMap

  /** Serial peeling reference: repeatedly remove the minimum-degree
    * node; its coreness is the running maximum of the degree at
    * removal (the classic exact algorithm, no round budget).
    */
  private def serial(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).distinct
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    und.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val out = scala.collection.mutable.Map.empty[Long, Long]
    var k = 0L
    while (adj.nonEmpty) {
      val (v, nb) = adj.minBy { case (n, s) => (s.size, n) }
      k = k max nb.size.toLong
      out(v) = k
      nb.foreach(m => adj.get(m).foreach(_ -= v))
      adj -= v
    }
    out.toMap
  }

  test("triangle with a tail: core numbers 2,2,2,1,1") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (1, 3), (3, 4), (4, 5))
    run(edges) shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L)
  }

  test("K4 hanging off a path: 3-core vs 1-shell") {
    val k4 = Seq[(Long, Long)]((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    val edges = k4 ++ Seq[(Long, Long)]((4, 5), (5, 6))
    val got = run(edges)
    Seq(1L, 2L, 3L, 4L).foreach(n => got(n) shouldBe 3L)
    got(5L) shouldBe 1L
    got(6L) shouldBe 1L
  }

  test("matches serial peeling on random graphs") {
    val rnd = new scala.util.Random(43)
    val edges = (0 until 500).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)
    }.filter(e => e._1 != e._2)
    run(edges) shouldBe serial(edges)
  }

  test("long chain needs many rounds but stays inside the budget") {
    // a 40-node path: influence chains are longest on paths
    val edges = (0L until 39L).map(i => (i, i + 1))
    val got = run(edges)
    got.values.toSet shouldBe Set(1L)
    run(edges, rounds = 29) shouldBe got // +1 round changes nothing
  }
}

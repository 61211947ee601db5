package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Luby MIS against the two defining properties (independence +
  * maximality) on random graphs, a serial reference replaying the same
  * deterministic rounds, hand-checked priority wins, and live-set
  * exhaustion within the fixed round budget.
  */
class MisSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int = 8)
      : Map[Long, Int] =
    Mis.select(edges.toDF("a", "b"), rounds)
      .as[(Long, Int)].collect().toMap

  private def prio(n: Long): Long =
    graft.functions.Md5Prefix60.hash60(
      org.apache.spark.unsafe.types.UTF8String.fromString(n.toString))

  /** Serial replay of the identical deterministic rounds. */
  private def serial(edges: Seq[(Long, Long)]): Map[Long, Int] = {
    val e0 = edges.filter(p => p._1 != p._2)
      .map(p => (p._1 min p._2, p._1 max p._2)).distinct
    var live = e0.flatMap(p => Seq(p._1, p._2)).distinct.toSet
    var e = e0
    val out = scala.collection.mutable.Map.empty[Long, Int]
    var i = 0
    while (live.nonEmpty) {
      i += 1
      val nbr = e.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
        .map { case (n, ps) => n -> ps.map(_._2).toSet }
      val sel = live.filter { n =>
        nbr.getOrElse(n, Set.empty).filter(live).forall { m =>
          prio(n) < prio(m) || (prio(n) == prio(m) && n < m)
        }
      }
      sel.foreach(out(_) = i)
      live = live -- sel -- sel.flatMap(nbr.getOrElse(_, Set.empty))
      e = e.filter(p => live(p._1) && live(p._2))
    }
    out.toMap
  }

  test("triangle plus pendant: exactly one triangle vertex wins") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (1, 3), (3, 4))
    val got = run(edges)
    got shouldBe serial(edges)
    // independence on the triangle: exactly one of {1,2,3}
    Seq(1L, 2L, 3L).count(got.contains) shouldBe 1
  }

  test("independence and maximality on random graphs") {
    val rnd = new scala.util.Random(17)
    val edges = (0 until 400).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)
    }.filter(p => p._1 != p._2)
    val und = edges.flatMap(p => Seq(p, p.swap)).toSet
    val mis = run(edges).keySet
    // independent: no edge inside the set
    und.foreach { case (a, b) =>
      (mis(a) && mis(b)) shouldBe false
    }
    // maximal: every non-member has a member neighbor
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).toSet
    (nodes -- mis).foreach { n =>
      und.exists(p => p._1 == n && mis(p._2)) shouldBe true
    }
    run(edges) shouldBe serial(edges)
  }

  test("live set empties within the 8-round budget (round column <= 8)") {
    val rnd = new scala.util.Random(19)
    val edges = (0 until 600).map { _ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)
    }.filter(p => p._1 != p._2)
    val got = run(edges, rounds = 8)
    val ser = serial(edges)
    got shouldBe ser // serial loops to TRUE fixpoint: 8 rounds reached it
    got.values.max should be <= 8
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Local-dominance matching invariants: it IS a matching, it equals the
  * serial greedy matching under the same (h, a, b) order once
  * converged, it is maximal at convergence, and it is layout-
  * independent.
  */
class MatchingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The same 60-bit md5 prefix the engine and oracle use. */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Serial greedy matching scanning canonical edges by (h, a, b). */
  private def serialGreedy(edges: Set[(String, String)]): Set[(String, String)] = {
    val canon = edges.map { case (x, y) => if (x < y) (x, y) else (y, x) }
      .filter { case (x, y) => x != y }
    val free = scala.collection.mutable.Set.empty[String]
    free ++= canon.flatMap { case (a, b) => Seq(a, b) }
    canon.toSeq.sortBy { case (a, b) => (h60(s"$a:$b"), a, b) }
      .flatMap { case (a, b) =>
        if (free(a) && free(b)) { free -= a; free -= b; Some((a, b)) }
        else None
      }.toSet
  }

  private def run(edges: Seq[(String, String)], rounds: Int = 10,
      parts: Int = 4): Seq[(String, String, Int)] =
    Matching.run(edges.toDF("src", "dst").repartition(parts), rounds = rounds)
      .as[(String, String, Int)].collect().toSeq

  test("matches serial greedy once converged, and is a valid matching") {
    val edges = Set(
      ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("c", "e"),
      ("e", "f"), ("f", "g"), ("g", "e"), ("h", "a"), ("h", "f"))
    val got = run(edges.toSeq)
    val pairs = got.map(t => (t._1, t._2)).toSet
    pairs shouldBe serialGreedy(edges)
    // matching property: every node appears at most once
    val nodes = got.flatMap(t => Seq(t._1, t._2))
    nodes.distinct.length shouldBe nodes.length
  }

  test("maximal at convergence: no remaining edge joins two free nodes") {
    val edges = (0 until 30).map(i => (s"n$i", s"n${(i * 7 + 3) % 30}"))
    val got = run(edges, rounds = 12)
    val matched = got.flatMap(t => Seq(t._1, t._2)).toSet
    edges.foreach { case (x, y) =>
      if (x != y) withClue(s"$x-$y") {
        (matched(x) || matched(y)) shouldBe true
      }
    }
  }

  test("deterministic under repartitioning and direction/duplication") {
    val edges = Seq(("p", "q"), ("q", "r"), ("r", "s"), ("s", "p"), ("q", "s"))
    val redirected = edges.map { case (x, y) => (y, x) } ++ edges
    run(edges, parts = 1) should contain theSameElementsAs
      run(redirected, parts = 7)
  }

  test("adversarial chain still progresses every round") {
    // a path; whatever the h order, each round matches >= 1 edge until done
    val path = (0 until 12).map(i => (f"v$i%02d", f"v${i + 1}%02d"))
    val got = run(path, rounds = 12)
    got.map(t => (t._1, t._2)).toSet shouldBe serialGreedy(path.toSet)
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Weighted SSSP: hand-checkable Bellman-Ford distances where the
  * cheapest route is NOT the fewest-hop route, parallel-edge min
  * collapse, round cap, isolated seeds, and partition invariance
  * (pure integer min/+ algebra).
  */
class SsspSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  //  a -10-> d          (direct but expensive)
  //  a -1-> b -1-> c -1-> d   (3 hops, total 3: cheaper than direct)
  //  a -7-> b           (parallel edge: must collapse to the min, 1)
  //  x -2-> y           (disconnected from seed a)
  private val edges = Seq(
    ("a", "d", 10L), ("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L),
    ("a", "b", 7L), ("x", "y", 2L)).toDF("src", "dst", "w")

  test("cheapest route beats fewest hops; parallel edges collapse") {
    val got = Sssp.run(edges, Seq("a").toDF("node"), rounds = 4)
      .as[(String, Long)].collect().toMap
    got shouldBe Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L)
    // x, y unreachable from a: absent
  }

  test("round cap: within 1 round only direct edges relax") {
    val got = Sssp.run(edges, Seq("a").toDF("node"), rounds = 1)
      .as[(String, Long)].collect().toMap
    // d reachable in 1 edge at cost 10 (the cheap 3-edge route needs
    // more rounds); b via the min of the two parallel edges
    got shouldBe Map("a" -> 0L, "b" -> 1L, "d" -> 10L)
    val two = Sssp.run(edges, Seq("a").toDF("node"), rounds = 2)
      .as[(String, Long)].collect().toMap
    two shouldBe Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 10L)
  }

  test("multi-source min, isolated seeds, partition invariance") {
    val multi = Sssp.run(edges, Seq("a", "c").toDF("node"), rounds = 4)
      .as[(String, Long)].collect().toMap
    multi shouldBe Map("a" -> 0L, "b" -> 1L, "c" -> 0L, "d" -> 1L)
    val iso = Sssp.run(edges, Seq("zz", "x").toDF("node"), rounds = 2)
      .as[(String, Long)].collect().toMap
    iso shouldBe Map("zz" -> 0L, "x" -> 0L, "y" -> 2L)
    val p1 = Sssp.run(edges, Seq("a").toDF("node"), rounds = 4)
      .orderBy("node").collect()
    val p2 = Sssp.run(edges.repartition(7),
      Seq("a").toDF("node").repartition(3), rounds = 4)
      .orderBy("node").collect()
    p1 should contain theSameElementsInOrderAs p2
  }
}

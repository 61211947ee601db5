package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Multi-source BFS: hand-checkable hop distances, unreachable nodes
  * absent, isolated seeds still emitted at hop 0, and partition
  * invariance (pure set algebra).
  */
class BfsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  //  a -> b -> c -> d -> e   (chain)
  //  x -> y                  (disconnected from the seeds)
  //  b -> a                  (back edge: must not shorten anything)
  private val edges = Seq(
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
    ("x", "y"), ("b", "a")).toDF("src", "dst")

  test("hop distances from a multi-source seed set") {
    // seeds {a, d}: d's frontier reaches e at hop 1 long before the
    // a-chain would (min-hop over all sources)
    val got = Bfs.run(edges, Seq("a", "d").toDF("node"), maxHops = 4)
      .as[(String, Int)].collect().toMap
    got shouldBe Map(
      "a" -> 0, "d" -> 0, "b" -> 1, "e" -> 1, "c" -> 2)
    // x, y unreachable from {a, d}: absent
  }

  test("cap, isolated seeds, and partition invariance") {
    val capped = Bfs.run(edges, Seq("a").toDF("node"), maxHops = 2)
      .as[(String, Int)].collect().toMap
    capped shouldBe Map("a" -> 0, "b" -> 1, "c" -> 2) // d, e beyond cap
    // a seed absent from the edge relation is still a valid source
    val iso = Bfs.run(edges, Seq("zz", "x").toDF("node"), maxHops = 3)
      .as[(String, Int)].collect().toMap
    iso shouldBe Map("zz" -> 0, "x" -> 0, "y" -> 1)
    val a = Bfs.run(edges, Seq("a", "d").toDF("node"), maxHops = 4)
      .orderBy("node").collect()
    val b = Bfs.run(edges.repartition(7), Seq("a", "d").toDF("node").repartition(3),
      maxHops = 4).orderBy("node").collect()
    a should contain theSameElementsInOrderAs b
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Sampled harmonic closeness: hand-checkable per-seed sums, per-seed
  * frontier independence (a node close to one seed is not close to
  * another), isolated seeds emitted with zero reach, and partition
  * invariance (pure set algebra + integer division).
  */
class ClosenessSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  //  a -> b -> c -> d -> e   (chain)
  //  x -> y                  (disconnected island)
  //  b -> a                  (back edge)
  private val edges = Seq(
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
    ("x", "y"), ("b", "a")).toDF("src", "dst")

  test("per-seed harmonic sums over the chain") {
    val got = Closeness.run(edges, Seq("a", "d", "x").toDF("node"), maxHops = 4)
      .as[(String, Long, Long)].collect()
      .map { case (n, r, h) => n -> ((r, h)) }.toMap
    // a reaches b@1 c@2 d@3 e@4: 1e6 + 500000 + 333333 + 250000
    got("a") shouldBe ((4L, 2083333L))
    // d reaches only e@1
    got("d") shouldBe ((1L, 1000000L))
    // x reaches only y@1 — the island does not see the chain
    got("x") shouldBe ((1L, 1000000L))
  }

  test("cap, isolated seeds, and partition invariance") {
    // cap at 2: a reaches b@1 c@2 only
    val capped = Closeness.run(edges, Seq("a").toDF("node"), maxHops = 2)
      .as[(String, Long, Long)].collect()
      .map { case (n, r, h) => n -> ((r, h)) }.toMap
    capped("a") shouldBe ((2L, 1500000L))
    // a seed with no out-edges (or absent entirely) still appears
    val iso = Closeness.run(edges, Seq("e", "zz").toDF("node"), maxHops = 3)
      .as[(String, Long, Long)].collect()
      .map { case (n, r, h) => n -> ((r, h)) }.toMap
    iso("e") shouldBe ((0L, 0L))
    iso("zz") shouldBe ((0L, 0L))
    val a = Closeness.run(edges, Seq("a", "d").toDF("node"), maxHops = 4)
      .orderBy("node").collect()
    val b = Closeness.run(edges.repartition(7),
      Seq("a", "d").toDF("node").repartition(3), maxHops = 4)
      .orderBy("node").collect()
    a should contain theSameElementsInOrderAs b
  }
}

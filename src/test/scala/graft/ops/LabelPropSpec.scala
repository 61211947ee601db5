package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Label propagation semantics on hand-traceable graphs: clamped seeds,
  * deterministic majority with (votes DESC, label ASC) ties, frontier
  * growth one hop per round, and parity with a serial reference.
  */
class LabelPropSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(
      edges: Seq[(String, String)], seeds: Seq[(String, String)],
      iters: Int = 3): Map[String, String] = {
    val und = edges ++ edges.map { case (a, b) => (b, a) }
    LabelProp.run(und.toDF("src", "dst"), seeds.toDF("node", "label"),
      iters = iters)
      .as[(String, Option[String])].collect()
      .collect { case (n, Some(l)) => n -> l }.toMap
  }

  test("labels advance one hop per round and seeds stay clamped") {
    // path: s - a - b - c, seed at s
    val edges = Seq(("s", "a"), ("a", "b"), ("b", "c"))
    val seeds = Seq(("s", "RED"))
    run(edges, seeds, iters = 1) shouldBe Map("s" -> "RED", "a" -> "RED")
    run(edges, seeds, iters = 3) shouldBe
      Map("s" -> "RED", "a" -> "RED", "b" -> "RED", "c" -> "RED")
  }

  test("majority vote wins; ties break to the lexicographically smallest label") {
    // m has two BLUE seed neighbors and one RED: BLUE wins
    val edges = Seq(("b1", "m"), ("b2", "m"), ("r1", "m"))
    val seeds = Seq(("b1", "BLUE"), ("b2", "BLUE"), ("r1", "RED"))
    run(edges, seeds, iters = 1)("m") shouldBe "BLUE"
    // tie: one APPLE and one BANANA neighbor -> APPLE (lexicographic)
    val tie = Seq(("x", "t"), ("y", "t"))
    val tieSeeds = Seq(("x", "BANANA"), ("y", "APPLE"))
    run(tie, tieSeeds, iters = 1)("t") shouldBe "APPLE"
  }

  test("a seed outvoted by neighbors keeps its clamped label, but still votes") {
    // seed island of the other color inside a BLUE sea
    val edges = Seq(("red", "u"), ("b1", "u"), ("b2", "u"), ("red", "b1"))
    val seeds = Seq(("red", "RED"), ("b1", "BLUE"), ("b2", "BLUE"))
    val out = run(edges, seeds, iters = 4)
    out("red") shouldBe "RED" // clamped even though all neighbors are BLUE
    out("u") shouldBe "BLUE" // 2 BLUE vs 1 RED
  }

  test("unreached nodes stay unlabeled") {
    val edges = Seq(("s", "a"), ("i1", "i2")) // i1-i2 disconnected from seed
    val out = run(edges, Seq(("s", "RED")), iters = 3)
    out.keySet shouldBe Set("s", "a")
  }
}

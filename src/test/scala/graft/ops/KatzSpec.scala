package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Exact walk-count semantics of [[Katz]] (β=1/2, 4 rounds, 2^4-scaled
  * integer scores) on graphs small enough to count by hand, plus
  * partition-invariance (pure integer arithmetic — any parallelism must
  * give identical scores).
  */
class KatzSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] = {
    import spark.implicits._
    Katz.run(edges.toDF("a", "b").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph 1-2-3: hand-counted walks") {
    // w1 = degree = (1,2,1); w2 = (2,2,2); w3 = (2,4,2); w4 = (4,4,4)
    // katz16 = 8*w1 + 4*w2 + 2*w3 + w4
    run(Seq((1L, 2L), (2L, 3L))) shouldBe Map(
      1L -> (8 * 1 + 4 * 2 + 2 * 2 + 4).toLong,
      2L -> (8 * 2 + 4 * 2 + 2 * 4 + 4).toLong,
      3L -> (8 * 1 + 4 * 2 + 2 * 2 + 4).toLong)
  }

  test("triangle: regular graph, every node identical") {
    // deg 2 everywhere; w2 = 4, w3 = 8, w4 = 16 -> 16+16+16+16 = 64
    run(Seq((1L, 2L), (2L, 3L), (1L, 3L))) shouldBe
      Map(1L -> 64L, 2L -> 64L, 3L -> 64L)
  }

  test("star S4: hub counts walks through itself") {
    // hub 0, leaves 1..4. w1 = (4; 1 each). w2(0) = 4, w2(leaf) = 4.
    // w3(0) = 16, w3(leaf) = 4. w4(0) = 16, w4(leaf) = 16.
    val edges = (1L to 4L).map(l => (0L, l))
    val got = run(edges)
    got(0L) shouldBe (8 * 4 + 4 * 4 + 2 * 16 + 16).toLong
    (1L to 4L).foreach { l =>
      got(l) shouldBe (8 * 1 + 4 * 4 + 2 * 4 + 16).toLong
    }
  }

  test("scores are partition-invariant") {
    val edges = for (i <- 0L until 30L; j <- Seq(1L, 7L) if i < (i + j) % 30)
      yield (i, (i + j) % 30)
    run(edges, parts = 1) shouldBe run(edges, parts = 7)
  }
}

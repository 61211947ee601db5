package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Kruskal-Wallis against hand-computed H values (including the scipy
  * cross-checked tied case), the degenerate all-tied guard, and a
  * textbook-formula reference on random data.
  */
class KruskalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(obs: Seq[(String, Long)]) =
    Kruskal.hTest(obs.toDF("grp", "v"))
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().head

  test("untied two-group example: H = 2.4, no tie correction") {
    val (k, n, t, tie, h, hc) =
      run(Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L)))
    (k, n) shouldBe ((2L, 4L))
    t shouldBe 4L
    tie shouldBe 1000000000000L
    h shouldBe 2400000L
    hc shouldBe Some(2400000L)
  }

  test("fully separated tied groups: H' = 3.0 (scipy kruskal agreement)") {
    val (_, _, _, tie, h, hc) =
      run(Seq(("A", 1L), ("A", 1L), ("B", 2L), ("B", 2L)))
    h shouldBe 2400000L
    tie shouldBe 800000000000L // C = 1 - 12/60
    // scipy reports 3.0; the quantized chain floors the IEEE quotient
    // 2.4/0.8 = 2.9999999999999996 (0.8 is not binary-exact) — the same
    // value both engines produce, which is what the oracle gate pins
    hc shouldBe Some(2999999L)
  }

  test("all observations identical: H = 0, corrected H is NULL (C = 0)") {
    val (_, _, t, tie, h, hc) =
      run(Seq(("A", 5L), ("A", 5L), ("B", 5L), ("B", 5L)))
    t shouldBe 0L
    tie shouldBe 0L
    h shouldBe 0L
    hc shouldBe None
  }

  test("matches the textbook uncentered formula on random data (within quantization)") {
    val rnd = new scala.util.Random(31)
    val obs = (0 until 300).map { _ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(40).toLong)
    }
    val (_, n, _, _, _, hc) = run(obs)
    n shouldBe 300L

    // reference: average ranks, H = 12/(N(N+1)) ΣR²/n - 3(N+1), / C
    val byV = obs.groupBy(_._2).view.mapValues(_.size).toMap
    val sortedV = byV.keys.toSeq.sorted
    val cum = sortedV.scanLeft(0L) { case (acc, v) => acc + byV(v) }
    val avgRank = sortedV.zipWithIndex.map { case (v, i) =>
      v -> (cum(i) + cum(i + 1) + 1) / 2.0
    }.toMap
    val groups = obs.groupBy(_._1).values
    val nTot = obs.size.toDouble
    val hRaw = 12.0 / (nTot * (nTot + 1)) * groups.map { g =>
      val r = g.map(o => avgRank(o._2)).sum
      r * r / g.size
    }.sum - 3 * (nTot + 1)
    val c = 1.0 - byV.values.map(t => t.toDouble * t * t - t).sum /
      (nTot * nTot * nTot - nTot)
    val want = hRaw / c * 1e6
    hc.get.toDouble shouldBe want +- 10000.0
  }
}

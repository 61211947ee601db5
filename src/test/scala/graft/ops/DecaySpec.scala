package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Decay-weighted sums: power-table floors, hand-computed scores, and
  * the mergeability property that makes the state streamable.
  */
class DecaySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("power table applies the per-step floor") {
    val rows = Decay.powRows(97, 100, 1000000, 3)
    rows shouldBe Vector(
      (0L, 1000000L), (1L, 970000L), (2L, 940900L), (3L, 912673L))
  }

  test("hand-computed decayed sum; day 0 counts at full weight") {
    val obs = Seq(
      ("a", 0L, 100L),  // 100
      ("a", 1L, 100L),  // (100*970000)/1e6 = 97
      ("a", 2L, 200L),  // (200*940900)/1e6 = 188
      ("b", 3L, 1000L)) // (1000*912673)/1e6 = 912
    val got = Decay.decayedSum(obs.toDF("key", "days_ago", "v"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (k, n, r, dec) => k -> ((n, r, dec)) }.toMap
    got("a") shouldBe ((3L, 400L, 385L))
    got("b") shouldBe ((1L, 1000L, 912L))
  }

  test("negative values decay identically (truncation toward zero both rows)") {
    val obs = Seq(("n", 1L, -100L), ("n", 1L, 100L))
    val got = Decay.decayedSum(obs.toDF("key", "days_ago", "v"))
      .as[(String, Long, Long, Long)].collect().head
    got shouldBe (("n", 2L, 0L, 0L)) // -97 + 97
  }
}

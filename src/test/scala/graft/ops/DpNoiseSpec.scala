package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The discrete-geometric DP mechanism: CDF-table invariants (an exact
  * partition of the uniform range), closed-form probability checks, and
  * the release path against an in-memory inverse-CDF reference.
  */
class DpNoiseSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CDF intervals exactly partition [0, 2^59)") {
    val rows = DpNoise.cdfRows
    rows.head._2 shouldBe 0L
    rows.last._3 shouldBe DpNoise.Scale
    rows.sliding(2).foreach { case Vector((_, _, hi), (_, lo, _)) =>
      lo shouldBe hi
    }
    rows.foreach { case (_, lo, hi) => hi should be > lo }
    // ks strictly increasing
    rows.map(_._1) shouldBe rows.map(_._1).sorted
  }

  test("interval widths match the closed-form geometric pmf within quantization") {
    // P(Z = 0) = (1-α)/(1+α) = 1/19; P(Z = ±1) = 9/190
    val byK = DpNoise.cdfRows.map { case (k, lo, hi) => k -> (hi - lo) }.toMap
    val s = DpNoise.Scale.toDouble
    byK(0).toDouble / s shouldBe (1.0 / 19) +- 1e-9
    byK(1).toDouble / s shouldBe (9.0 / 190) +- 1e-9
    byK(-1).toDouble / s shouldBe (9.0 / 190) +- 1e-9
    // symmetry of the two-sided mechanism (up to the α-power floors)
    (math.abs(byK(5) - byK(-5)).toDouble / s) should be < 1e-9
    // total mass re-checked: Σ widths = Scale (partition test covers it,
    // but state the mechanism property explicitly)
    byK.values.sum shouldBe DpNoise.Scale
  }

  test("ε-DP ratio: adjacent-count probabilities differ by at most 10/9 (+ floor slack)") {
    val byK = DpNoise.cdfRows.map { case (k, lo, hi) => k -> (hi - lo) }.toMap
    for (k <- -30 to 29; if byK.contains(k) && byK.contains(k + 1)) {
      val ratio = byK(k).toDouble / byK(k + 1)
      ratio should be >= 9.0 / 10 - 1e-9
      ratio should be <= 10.0 / 9 + 1e-9
    }
  }

  test("release matches an in-memory inverse-CDF reference on known keys") {
    val counts = Seq(("view", 100L), ("click", 50L), ("purchase", 7L))
    val got = DpNoise.release(counts.toDF("key", "n"))
      .as[(String, Long)].collect().toMap

    val md = java.security.MessageDigest.getInstance("MD5")
    def u(key: String): Long = {
      val hex = md.digest(key.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) / 2
    }
    val expected = counts.map { case (k, n) =>
      val uu = u(k)
      val z = DpNoise.cdfRows
        .find { case (_, lo, hi) => uu >= lo && uu < hi }.get._1
      k -> (n + z)
    }.toMap
    got shouldBe expected
  }
}

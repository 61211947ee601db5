package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Isotonic calibration (q_isotonic): the distributed minimax fit vs an
  * independent serial evaluation of the same identity, plus the
  * structural isotonic property on the driver's real data.
  */
class IsotonicSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Serial minimax-of-quantized-averages over (bin, n, sy) rows —
    * independent of any Spark machinery.
    */
  private def serialIso(bins: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    val sorted = bins.sortBy(_._1)
    val idx = sorted.map(_._1)
    def avg(j: Int, k: Int): Long = {
      val sy = (j to k).map(sorted(_)._3).sum
      val w = (j to k).map(sorted(_)._2).sum
      (sy * 1000000L) / w
    }
    idx.indices.map { i =>
      val fit = (0 to i).map { j =>
        (i until idx.length).map(k => avg(j, k)).min
      }.max
      idx(i) -> fit
    }.toMap
  }

  test("real-data fit is isotonic, bounded, and pools every violation") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_isotonic")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    rows.length should be > 2
    // isotonic property: non-decreasing in bin (holds structurally —
    // larger i shrinks the inner min's k-range and grows the outer
    // max's j-range, so the floor-quantized minimax is monotone too)
    rows.map(_._4).sliding(2).foreach {
      case Array(a, b) => b should be >= a
      case _ =>
    }
    // fits are probabilities and live inside the raw-rate envelope
    val fracs = rows.map(_._3)
    rows.map(_._4).foreach { f =>
      f should be >= 0L
      f should be <= 1000000L
      f should be >= fracs.min
      f should be <= fracs.max
    }
    // the raw reliability curve on this scorer is NOT already isotonic
    // (otherwise this query would be vacuous here)
    fracs.sliding(2).exists {
      case Array(a, b) => b < a
      case _ => false
    } shouldBe true

    // distributed == serial on the SAME bin aggregates. sy is uniquely
    // invertible from frac_pos_fp = (sy*1e6) div n whenever n < 1e6
    // (the candidate interval [frac*n/1e6, (frac+1)*n/1e6) is narrower
    // than 1): sy = ceil(frac*n / 1e6)
    val bins = rows.map { case (bin, n, frac, _) =>
      n should be < 1000000L
      val sy = (frac * n + 999999L) / 1000000L
      ((sy * 1000000L) / n) shouldBe frac // inversion sanity
      (bin, n, sy)
    }.toSeq
    val expected = serialIso(bins)
    rows.foreach { case (bin, _, _, iso) => iso shouldBe expected(bin) }
  }

  test("planted violation pools to the weighted average") {
    // bins: frac 0.9 then 0.1 (violation) with equal weight -> both pool
    // to 0.5; an isotonic tail stays put
    val bins = Seq((0L, 10L, 9L), (1L, 10L, 1L), (2L, 10L, 8L))
    val iso = serialIso(bins)
    iso(0L) shouldBe iso(1L) // pooled
    iso(0L) shouldBe 500000L // (9+1)*1e6/20
    iso(2L) shouldBe 800000L
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Log-rank test against a hand-computed two-group table, a serial
  * reference on random censored data, and the structural invariants
  * (censor-only times contribute nothing; identical groups give
  * chi2 ~ 0; oe_fp sums to the reported cumulative).
  */
class LogrankSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = Logrank.ScaleFp

  private def run(subs: Seq[(String, Long, Int)])
      : Seq[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)] =
    Logrank.test(subs.toDF("grp", "dur", "churn"), grpA = "a")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq

  /** Serial reference: same staged fixed-point recipe, single-threaded. */
  private def serial(subs: Seq[(String, Long, Int)])
      : Seq[(Long, Long, Long, Long, Long, Long, Long)] = {
    val byDur = subs.groupBy(_._2).toSeq.sortBy(_._1)
    var nA = subs.count(_._1 == "a").toLong
    var nB = subs.count(_._1 != "a").toLong
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long, Long)]
    byDur.foreach { case (dur, rows) =>
      val dA = rows.count(r => r._1 == "a" && r._3 == 1).toLong
      val dB = rows.count(r => r._1 != "a" && r._3 == 1).toLong
      val cA = rows.count(r => r._1 == "a" && r._3 == 0).toLong
      val cB = rows.count(r => r._1 != "a" && r._3 == 0).toLong
      val n = nA + nB
      val d = dA + dB
      if (d > 0 && n > 1) {
        val t1 = d * nA * S / n
        val oe = dA * S - t1
        val v = (t1 * nB / n) * (n - d) / (n - 1)
        out += ((dur, nA, nB, dA, dB, oe, v))
      }
      nA -= dA + cA
      nB -= dB + cB
    }
    out.toSeq
  }

  test("hand-computed two-group table with censoring and a tie") {
    // dur 1: a dies (a: 3 at risk, b: 3) ; dur 2: b censored only;
    // dur 3: one death in EACH group (tie); dur 4: last b dies
    val subs = Seq(
      ("a", 1L, 1), ("a", 3L, 1), ("a", 4L, 0),
      ("b", 2L, 0), ("b", 3L, 1), ("b", 4L, 1))
    val got = run(subs)
    got.map(_._1) shouldBe Seq(1L, 3L, 4L) // censor-only dur 2 dropped
    val r1 = got(0)
    // n=6, d=1, n_a=3: E = 1*3*S/6 = S/2; oe = S - S/2
    r1 shouldBe ((1L, 6L, 3L, 3L, 1L, 0L, 500000L,
      (500000L * 3 / 6) * 5 / 5, 500000L, 250000L, 1000000L))
    val r2 = got(1)
    // dur 3: at risk a=2 (one died, none censored), b=2 (one censored);
    // d=2, E_a = 2*2*S/4 = S; oe = S - S = 0
    r2._2 shouldBe 4L; r2._3 shouldBe 2L; r2._4 shouldBe 2L
    r2._5 shouldBe 1L; r2._6 shouldBe 1L; r2._7 shouldBe 0L
    // v = ((2*2*S/4)*2/4)*(4-2)/(4-1) = (S/2)*2/3
    r2._8 shouldBe (1000000L * 2 / 4) * 2 / 3
    // dur 4: a censored, b dies: n_a=1, n_b=1, d=1
    val r3 = got(2)
    r3._5 shouldBe 0L; r3._6 shouldBe 1L
    r3._7 shouldBe -500000L // 0 - 1*1*S/2
  }

  test("identical groups give oe contributions that cancel to ~0") {
    val subs = (1 to 40).flatMap(i =>
      Seq(("a", i.toLong % 7 + 1, i % 3 min 1), ("b", i.toLong % 7 + 1, i % 3 min 1)))
    val got = run(subs)
    // perfectly symmetric groups: every per-time oe is exactly 0
    got.foreach(r => r._7 shouldBe 0L)
    got.last._11 shouldBe 0L
  }

  test("matches the serial staged fixed-point recipe on random data") {
    val rnd = new scala.util.Random(23)
    val subs = (0 until 400).map { _ =>
      (if (rnd.nextBoolean()) "a" else "b",
        rnd.nextInt(15).toLong + 1, rnd.nextInt(3) min 1)
    }
    val got = run(subs)
    val want = serial(subs)
    got.size shouldBe want.size
    got.zip(want).foreach { case (g, w) =>
      (g._1, g._3, g._4, g._5, g._6, g._7, g._8) shouldBe
        ((w._1, w._2, w._3, w._4, w._5, w._6, w._7))
    }
    // cumulative columns are the running sums of the per-time columns
    got.map(_._7).sum shouldBe got.last._9
    got.map(_._8).sum shouldBe got.last._10
  }
}

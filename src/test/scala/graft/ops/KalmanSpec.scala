package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Kalman fold: matches a serial reference of the integer recurrence,
  * the gain anneals monotonically from its wide-prior start toward the
  * algebraic fixed point, denoises a constant-signal series, and is
  * bit-identical under repartitioning.
  */
class KalmanSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDf(rows: Seq[(String, Long, Double)]) =
    rows.map { case (s, i, v) =>
      (s, new Timestamp(1700000000000L + i * 60000L), i, v)
    }.toDF("symbol", "ts", "event_id", "value")

  private def serial(ps: Seq[Long]): Seq[(Long, Long, Long)] = {
    var x = 0L; var pv = 0L
    ps.zipWithIndex.map { case (p, i) =>
      var k = 0L
      if (i == 0) { x = p; pv = Kalman.R }
      else {
        val pp = pv + Kalman.Q
        k = (pp * Kalman.S) / (pp + Kalman.R)
        x = x + (k * (p - x)) / Kalman.S
        pv = ((Kalman.S - k) * pp) / Kalman.S
      }
      (x, pv, k)
    }
  }

  test("matches the serial recurrence, including a down-jumping series") {
    val a = (0 until 80).map(i => ("A", i.toLong, 300.0 - (i % 7) * 41.5))
    val b = (0 until 80).map(i => ("B", i.toLong + 200, 5.0 + i * 2.25))
    val out = Kalman.filter(mkDf(a ++ b)).orderBy("event_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    val expA = serial(a.map(r => math.floor(r._3 * 100 + 0.5).toLong))
    val expB = serial(b.map(r => math.floor(r._3 * 100 + 0.5).toLong))
    out.take(80).map(r => (r._3, r._4, r._5)) should
      contain theSameElementsInOrderAs expA
    out.drop(80).map(r => (r._3, r._4, r._5)) should
      contain theSameElementsInOrderAs expB
  }

  test("gain anneals monotonically to the algebraic fixed point") {
    val flat = (0 until 300).map(i => ("F", i.toLong, 100.0))
    val ks = Kalman.filter(mkDf(flat)).orderBy("event_id")
      .as[(Long, Long, Long, Long, Long)].collect().map(_._5)
    // first update uses the wide prior: k ~= (R+Q)/(2R+Q) ~= 0.5006
    ks(1) shouldBe (Kalman.R + Kalman.Q) * Kalman.S /
      (2 * Kalman.R + Kalman.Q)
    // non-increasing, and converged near P∞: P solves
    // P² + Q·P − Q·R = 0 → P∞ ≈ 487.6, k∞ = (P∞+Q)/(P∞+Q+R) ≈ 0.0488
    ks.drop(1).sliding(2).foreach { w => w(1) should be <= w(0) }
    val kInf = ks.last.toDouble / Kalman.S
    kInf shouldBe 0.0488 +- 0.002
  }

  test("denoises: steady-state estimate of a noisy constant stays within 3 posterior sigma") {
    val rnd = new scala.util.Random(3)
    val noisy = (0 until 400).map(i =>
      ("N", i.toLong, 250.0 + rnd.nextGaussian() * 1.0))
    val out = Kalman.filter(mkDf(noisy)).orderBy("event_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // steady-state posterior sigma = sqrt(P∞) ≈ 22 cents; the last 100
    // estimates stay within 3σ of the true 25000 while the raw
    // measurements swing ±100 cents (σ_z = 100)
    out.drop(300).foreach { r =>
      math.abs(r._3 - 25000L) should be <= 66L
    }
  }

  test("bit-identical under repartitioning") {
    val rnd = new scala.util.Random(17)
    val noisy = (0 until 300).map(i =>
      ("P" + i % 3, i.toLong, 50.0 + rnd.nextGaussian() * 20))
    val df = mkDf(noisy)
    val a = Kalman.filter(df).orderBy("event_id").collect()
    val b = Kalman.filter(df.repartition(11)).orderBy("event_id").collect()
    a should contain theSameElementsInOrderAs b
  }
}

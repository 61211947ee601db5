package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Durbin-Levinson recursion (the q_pacf core, single-sourced through
  * TechQueries.durbinLevinson): the PACF of an AR(p) process cuts off
  * exactly after lag p — THE property the operator exists to expose.
  * Fed exact Yule-Walker autocorrelations in fixed point.
  */
class PacfSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pacf(r: Seq[Long]): Seq[Long] = {
    val rr = Seq((r(0), r(1), r(2), r(3), r(4)))
      .toDF("r1", "r2", "r3", "r4", "r5")
    val dl = TechQueries.durbinLevinson("div").foldLeft(rr) {
      case (f, (n, e)) => f.withColumn(n, expr(e))
    }
    dl.select("p11", "p22", "p33", "p44", "p55")
      .as[(Long, Long, Long, Long, Long)].head()
      .productIterator.map(_.asInstanceOf[Long]).toSeq
  }

  test("AR(1): pacf cuts off after lag 1") {
    // rho = 0.5 -> r_k = rho^k exactly in fp
    val got = pacf(Seq(500000L, 250000L, 125000L, 62500L, 31250L))
    got.head shouldBe 500000L
    got.tail.foreach(v => math.abs(v) should be <= 5L) // truncation only
  }

  test("AR(2): pacf2 recovers phi2, cuts off after lag 2") {
    // phi1 = 0.5, phi2 = 0.3; Yule-Walker ACF:
    // r1 = phi1/(1-phi2), r_k = phi1 r_{k-1} + phi2 r_{k-2}
    val phi1 = 0.5; val phi2 = 0.3
    val r1 = phi1 / (1 - phi2)
    val rs = Iterator.iterate((r1, 1.0)) { case (a, b) =>
      (phi1 * a + phi2 * b, a)
    }.take(5).map(_._1).toSeq
    val got = pacf(rs.map(v => math.floor(v * 1e6).toLong))
    got(1) shouldBe (300000L +- 60L) // phi2, a few fp units of truncation
    got.drop(2).foreach(v => math.abs(v) should be <= 60L)
  }

  test("white noise: all pacf zero") {
    pacf(Seq(0L, 0L, 0L, 0L, 0L)).foreach(_ shouldBe 0L)
  }
}

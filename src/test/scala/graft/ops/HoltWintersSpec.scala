package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Holt-Winters fold against a serial reference (same integer recurrence
  * single-threaded), hand-checked cold-start/seasonal-slot behavior, and
  * the seasonal-learning property on a pure periodic signal.
  */
class HoltWintersSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], m: Int)
      : Seq[(String, Long, Long, Long, Long, Long, Long)] =
    HoltWinters.smooth(rows.toDF("symbol", "hb", "p"), m)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  private def serial(rows: Seq[(Long, Long)], m: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    def tdiv(a: Long, d: Long) = a / d
    val s = Array.fill(m)(0L)
    var l = 0L; var b = 0L; var t = 0L
    rows.sortBy(_._1).map { case (hb, p) =>
      t += 1
      val idx = ((t - 1) % m).toInt
      if (t == 1) { l = p; b = 0 }
      else {
        val lp = l
        l = tdiv(2 * (p - s(idx)) + 8 * (l + b), 10)
        b = tdiv((l - lp) + 9 * b, 10)
      }
      s(idx) = tdiv((p - l) + 3 * s(idx), 4)
      (hb, l, b, s(idx), l + b + s((t % m).toInt))
    }
  }

  test("first row: level = price, trend and seasonal zero") {
    val got = run(Seq(("x", 5L, 1234L)), m = 4)
    got shouldBe Seq(("x", 5L, 1234L, 1234L, 0L, 0L, 1234L))
  }

  test("matches the serial recurrence on random multi-series data") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      sym <- Seq("a", "b", "c")
      hb <- 0 until 120
    } yield (sym, hb.toLong, rnd.nextLong(20001) - 10000L)
    val got = run(rows, m = 24)
    Seq("a", "b", "c").foreach { sym =>
      val want = serial(
        rows.filter(_._1 == sym).map(r => (r._2, r._3)), m = 24)
      val g = got.filter(_._1 == sym)
        .map(r => (r._2, r._4, r._5, r._6, r._7))
      g shouldBe want
    }
  }

  test("learns a pure additive seasonal pattern: forecasts converge") {
    // constant level 10000 + seasonal bump of +800 on slot 0 of 4
    val rows = (0 until 400).map { t =>
      ("p", t.toLong, 10000L + (if (t % 4 == 0) 800L else 0L))
    }
    val got = run(rows, m = 4)
    // late in the series, one-step forecasts should track the signal
    // closely: forecast at t predicts p at t+1
    val tail = got.takeRight(40)
    tail.sliding(2).foreach { case Seq(prev, cur) =>
      math.abs(prev._7 - cur._3) should be <= 60L
    }
  }

  test("negative values exercise truncate-toward-zero on both arms") {
    val rows = (0 until 50).map(t =>
      ("n", t.toLong, (if (t % 2 == 0) -7919L else 7907L) * (t % 5 + 1)))
    val got = run(rows, m = 3)
    val want = serial(rows.map(r => (r._2, r._3)), m = 3)
    got.map(r => (r._2, r._4, r._5, r._6, r._7)) shouldBe want
  }
}

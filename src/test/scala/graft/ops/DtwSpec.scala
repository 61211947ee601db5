package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class DtwSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unrolled lateral-alias DP equals the reference DTW on random windows") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((
      Array.fill(8)(rnd.nextDouble() * 200 - 100),
      Array.fill(8)(rnd.nextDouble() * 200 - 100)))
    val cells = Dtw.cellExprs(
      i => s"element_at(win, $i)", j => s"element_at(qwin, $j)", 8, 2)
    val got = rows.toDF("win", "qwin")
      .selectExpr(
        Seq("win", "qwin") ++ cells.map { case (a, e) => s"$e AS $a" }: _*)
      .select(col("d_8_8")).as[Double].collect()
    val want = rows.map { case (a, b) => Dtw.reference(a, b, 2) }
    // identical fixed-order +/*/min arithmetic: exact equality, no epsilon
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("banded DTW tolerates a one-step time shift that Euclidean punishes") {
    val a = Array(0.0, 1, 4, 9, 4, 1, 0, 0)
    val b = Array(0.0, 0, 1, 4, 9, 4, 1, 0) // same shape, shifted by one
    val dtw = Dtw.reference(a, b, 2)
    val euc = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    dtw shouldBe 0.0 // perfect warped alignment inside the band
    euc should be > 50.0
  }

  test("zero-radius band degenerates to the pointwise Euclidean fold") {
    val rnd = new scala.util.Random(5)
    val a = Array.fill(8)(rnd.nextDouble() * 10)
    val b = Array.fill(8)(rnd.nextDouble() * 10)
    val euc = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    Dtw.reference(a, b, 0) shouldBe euc +- 1e-12
  }
}

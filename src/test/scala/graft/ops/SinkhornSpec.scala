package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Sinkhorn scaling sanity on hand-built cell frames: after 15 rounds
  * the plan's row sums must approximate the source marginals (that is
  * the fixed point being approached), identical populations must put
  * their mass on the diagonal (cost ≈ 0), and separated populations
  * must pay a strictly positive cost.
  */
class SinkhornSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cells(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("h", "vb", "hb")

  test("identical populations: mass concentrates on the diagonal") {
    val pop = for (v <- 0L to 3L; _ <- 1 to 10) yield v
    val in = cells(pop.map(v => (0L, v, 0L)) ++ pop.map(v => (1L, v, 0L)))
    val out = Sinkhorn.run(in).collect()
    val total = out.map(_.getLong(5)).sum.toDouble
    val diag = out.filter(r => r.getLong(0) == r.getLong(2))
      .map(_.getLong(5)).sum.toDouble
    // lambda = 4 (tuned for the 0..16 production grid) smooths hard on
    // a 0..3 toy grid — e^(-1/4) = 0.78 per step — so the diagonal
    // cannot dominate outright; it must still clearly beat the uniform
    // 4-cell share of 0.25 (measured 0.334)
    (diag / total) should be > 0.30
    // the entropic plan must beat the INDEPENDENT coupling, whose
    // average cost on this uniform 4x4 grid is sum|i-j|/16 = 1.25
    // (measured 1.04 — smoothing pays real cost, but less than chance)
    val cost = out.head.getLong(6).toDouble
    (cost / total) should be < 1.15
  }

  test("separated populations pay more than overlapping ones") {
    def shifted(d: Long) = cells(
      (1 to 20).map(_ => (0L, 0L, 0L)) ++ (1 to 20).map(_ => (1L, d, 0L)))
    def unitCost(rows: Array[org.apache.spark.sql.Row]): Double = {
      val total = rows.map(_.getLong(5)).sum.toDouble
      rows.head.getLong(6).toDouble / total
    }
    val near = unitCost(Sinkhorn.run(shifted(1)).collect())
    val far = unitCost(Sinkhorn.run(shifted(5)).collect())
    far should be > near
    far should be > 3.0 // 5 grid steps apart, entropic smoothing < 2 off
  }

  test("plan row sums approximate the source marginal") {
    val in = cells((1 to 30).map(_ => (0L, 0L, 0L)) ++
      (1 to 10).map(_ => (0L, 1L, 0L)) ++
      (1 to 20).map(_ => (1L, 0L, 0L)) ++
      (1 to 20).map(_ => (1L, 1L, 0L)))
    val out = Sinkhorn.run(in).collect()
    val total = out.map(_.getLong(5)).sum.toDouble
    val row0 = out.filter(_.getLong(0) == 0L).map(_.getLong(5)).sum.toDouble
    // source marginal r(vb=0) = 0.75
    (row0 / total) shouldBe 0.75 +- 0.05
  }
}

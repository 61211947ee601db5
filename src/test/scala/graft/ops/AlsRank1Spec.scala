package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Rank-1 ALS invariants: parity with a serial integer reference (the
  * identical fixed-point recurrence in plain Scala), exact recovery of a
  * planted rank-1 matrix's factor ORDER, and physical-layout
  * independence (repartitioning and duplicate ratings).
  */
class AlsRank1Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = 1000000L
  private val Reg = 1000000L

  /** Serial reference: identical integer recurrence. */
  private def serialAls(
      ratings: Seq[(Long, Long, Long)], iters: Int): Map[(String, Long), Long] = {
    val rt = ratings.groupBy(t => (t._1, t._2))
      .map { case ((u, i), ts) => (u, i, ts.map(_._3).sum) }
      .filter(_._3 > 0).toSeq
    val items = rt.map(_._2).distinct
    val users = rt.map(_._1).distinct
    var v = items.map(_ -> S).toMap
    var u = Map.empty[Long, Long]
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = math.max(if (m.isEmpty) 0L else m.values.max, 1L)
      m.map { case (k, x) => k -> x * S / mx }
    }
    for (_ <- 1 to iters) {
      u = norm(users.map { uu =>
        val rs = rt.filter(_._1 == uu)
        val num = rs.map(t => t._3 * v(t._2)).sum
        val den = rs.map(t => v(t._2) * v(t._2) / S).sum + Reg
        uu -> num * S / den
      }.toMap)
      v = norm(items.map { ii =>
        val rs = rt.filter(_._2 == ii)
        val num = rs.map(t => t._3 * u(t._1)).sum
        val den = rs.map(t => u(t._1) * u(t._1) / S).sum + Reg
        ii -> num * S / den
      }.toMap)
    }
    u.map { case (k, f) => ("u", k) -> f } ++
      v.map { case (k, f) => ("i", k) -> f }
  }

  private def run(ratings: Seq[(Long, Long, Long)],
      parts: Int = 4): Map[(String, Long), Long] =
    AlsRank1.run(ratings.toDF("user", "item", "r").repartition(parts))
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("matches the serial integer recurrence on a mixed matrix") {
    val ratings = Seq[(Long, Long, Long)](
      (1L, 10L, 5L), (1L, 11L, 3L), (1L, 12L, 1L),
      (2L, 10L, 4L), (2L, 12L, 2L), (3L, 11L, 7L),
      (3L, 13L, 2L), (4L, 10L, 1L), (4L, 13L, 6L))
    run(ratings) shouldBe serialAls(ratings, 3)
  }

  test("planted rank-1 matrix: factor order is recovered exactly") {
    // r_ui = a_u * b_i with a = (1,2,4), b = (1,3,5): the alternating
    // update recovers factors proportional to a and b; after max-
    // normalization the ORDER and the ratios survive integer truncation
    val a = Map(1L -> 1L, 2L -> 2L, 3L -> 4L)
    val b = Map(10L -> 1L, 11L -> 3L, 12L -> 5L)
    val ratings = for (u <- a.keys.toSeq; i <- b.keys.toSeq)
      yield (u, i, a(u) * b(i))
    val got = run(ratings)
    got(("u", 3L)) shouldBe S // the max user factor normalizes to scale
    got(("i", 12L)) shouldBe S
    got(("u", 2L)) should be > got(("u", 1L))
    got(("i", 11L)) should be > got(("i", 10L))
    // planted ratio a_2/a_3 = 1/2 within integer-truncation slack
    got(("u", 2L)).toDouble / S shouldBe 0.5 +- 0.01
    got(("i", 11L)).toDouble / S shouldBe 0.6 +- 0.01
  }

  test("results are identical under repartitioning; duplicates sum") {
    val ratings = Seq[(Long, Long, Long)](
      (1L, 10L, 2L), (2L, 10L, 3L), (2L, 11L, 1L), (3L, 11L, 4L))
    run(ratings, parts = 1) shouldBe run(ratings, parts = 7)
    // duplicate rows SUM into the same matrix entry (r_ui doubled) —
    // the distributed result still matches the serial recurrence on
    // the summed matrix bit-for-bit
    run(ratings ++ ratings, parts = 7) shouldBe serialAls(ratings ++ ratings, 3)
  }
}

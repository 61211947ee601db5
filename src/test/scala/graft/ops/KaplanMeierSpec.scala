package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Kaplan-Meier life-table fold against hand-computed curves, a serial
  * in-memory reference on random data, and the censoring semantics
  * (censored exits shrink the risk set, never the survival product).
  */
class KaplanMeierSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = 1000000000000L

  /** Serial reference: the same integer recurrence, single-threaded. */
  private def serial(subjects: Seq[(String, Long, Int)])
      : Map[(String, Long), (Long, Long, Long, Long)] =
    subjects.groupBy(_._1).flatMap { case (cohort, subs) =>
      val life = subs.groupBy(_._2).toSeq.sortBy(_._1).map {
        case (dur, rows) =>
          (dur, rows.count(_._3 == 1).toLong, rows.count(_._3 == 0).toLong)
      }
      var nRisk = subs.size.toLong
      var s = S
      life.map { case (dur, d, c) =>
        s = s * (nRisk - d) / nRisk
        val out = (cohort, dur) -> ((nRisk, d, c, s))
        nRisk -= d + c
        out
      }
    }

  test("hand-computed curve with interleaved censoring") {
    // durs: 1+, 1+, 2c, 3+, 3c  (+ churn, c censored)
    val subs = Seq(
      ("A", 1L, 1), ("A", 1L, 1), ("A", 2L, 0), ("A", 3L, 1), ("A", 3L, 0))
    val got = KaplanMeier.curve(subs.toDF("cohort", "dur", "churn"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    got shouldBe Set(
      ("A", 1L, 5L, 2L, 0L, 600000000000L), // 1 * 3/5
      ("A", 2L, 3L, 0L, 1L, 600000000000L), // censor only: S unchanged
      ("A", 3L, 2L, 1L, 1L, 300000000000L)) // * 1/2
  }

  test("all-censored cohort keeps survival at 1, risk set still drains") {
    val subs = Seq(("C", 1L, 0), ("C", 2L, 0), ("C", 5L, 0))
    val got = KaplanMeier.curve(subs.toDF("cohort", "dur", "churn"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    got shouldBe Set(
      ("C", 1L, 3L, 0L, 1L, S), ("C", 2L, 2L, 0L, 1L, S),
      ("C", 5L, 1L, 0L, 1L, S))
  }

  test("matches the serial fold on deterministic random multi-cohort data") {
    val rnd = new scala.util.Random(11)
    val subs = (0 until 500).map { _ =>
      (s"c${rnd.nextInt(3)}", rnd.nextInt(20).toLong + 1, rnd.nextInt(2))
    }
    val got = KaplanMeier.curve(subs.toDF("cohort", "dur", "churn"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map { case (co, t, n, d, c, s) => (co, t) -> ((n, d, c, s)) }.toMap
    got shouldBe serial(subs)
  }

  test("Nelson-Aalen cumulative hazard on the same hand-computed table") {
    val subs = Seq(
      ("A", 1L, 1), ("A", 1L, 1), ("A", 2L, 0), ("A", 3L, 1), ("A", 3L, 0))
    val got = KaplanMeier.nelsonAalen(subs.toDF("cohort", "dur", "churn"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    got shouldBe Set(
      ("A", 1L, 5L, 2L, 0L, 400000000000L, 400000000000L), // 2/5
      ("A", 2L, 3L, 0L, 1L, 0L, 400000000000L),            // censor: +0
      ("A", 3L, 2L, 1L, 1L, 500000000000L, 900000000000L)) // +1/2
  }

  test("no censoring: curve ends at the empirical survivor fraction (divisible steps)") {
    // 8 subjects, deaths at t=1 (4), t=2 (2), t=3 (1): every step divides
    // exactly, so the floor chain telescopes to the true fraction
    val subs = Seq.fill(4)(("E", 1L, 1)) ++ Seq.fill(2)(("E", 2L, 1)) ++
      Seq(("E", 3L, 1), ("E", 9L, 1))
    val last = KaplanMeier.curve(subs.toDF("cohort", "dur", "churn"))
      .filter($"dur" === 3L)
      .select($"surv_fp").as[Long].head()
    last shouldBe S / 8 // 1/2 * 2/4 * 1/2 = 1/8
  }
}

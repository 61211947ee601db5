package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Boosted-stump training vs an independent serial reference: the same
  * recurrence written as plain Scala over (bucket -> (n, sum_r)) maps.
  */
class BoostSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** Serial reference: identical integer algebra, no Spark. */
  private def serial(
      rows: Seq[(Long, Long)], rounds: Int): Seq[(Int, Long, Long, Long, Long)] = {
    var b: Map[Long, (Long, Long)] = rows.groupBy(_._1).map { case (s, g) =>
      s -> (g.size.toLong, g.map(_._2).sum)
    }
    (1 to rounds).map { t =>
      val ss = b.keys.toSeq.sorted
      val nn = b.values.map(_._1).sum
      val tot = b.values.map(_._2).sum
      val cands = ss.scanLeft((0L, 0L, 0L)) { case ((_, cn, cs), s) =>
        (s, cn + b(s)._1, cs + b(s)._2)
      }.tail.filter { case (_, cn, _) => nn - cn > 0 }
        .map { case (s, cn, cs) =>
          val gain = (cs * cs) / cn + ((tot - cs) * (tot - cs)) / (nn - cn)
          (s, gain, (cs / cn) / 2, ((tot - cs) / (nn - cn)) / 2)
        }
      val (sp, gain, lv, rv) = cands.maxBy { case (s, g, _, _) => (g, -s) }
      b = b.map { case (s, (n, sr)) =>
        s -> (n, sr - n * (if (s <= sp) lv else rv))
      }
      (t, sp, lv, rv, gain)
    }
  }

  test("matches the serial reference on planted data (3 rounds)") {
    import spark.implicits._
    // two clear clusters (target 1000 below s=5, 0 above) + noise rows
    val rows: Seq[(Long, Long)] =
      (0L to 4L).flatMap(s => Seq.fill(5)((s, 1000L))) ++
        (6L to 10L).flatMap(s => Seq.fill(5)((s, 0L))) ++
        Seq((2L, 0L), (8L, 1000L), (5L, 1000L), (5L, 0L))
    val sc = rows.toDF("s", "y_fp")
    val got = Boost.train(sc, rounds = 3)
      .select("round", "split_at", "left_fp", "right_fp", "gain_fp")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    got shouldBe serial(rows, 3)
    // round 1 must find the planted boundary region
    got.head._2 should (be >= 4L and be <= 5L)
  }

  test("residual mass shrinks: later rounds never increase total SSE proxy") {
    import spark.implicits._
    val rows: Seq[(Long, Long)] = (0L until 40L).map(s =>
      (s % 13, if (s % 3 == 0) 1000L else 0L))
    val model = Boost.train(rows.toDF("s", "y_fp"), rounds = 3)
      .select("round", "gain_fp")
      .as[(Int, Long)].collect().sortBy(_._1)
    model.map(_._2).foreach(_ should be >= 0L)
    // each round's achievable gain is bounded by the previous one's
    // (greedy on a shrinking residual), allowing equality on plateaus
    model.sliding(2).foreach {
      case Array((_, g1), (_, g2)) => g2 should be <= g1
      case _ =>
    }
  }
}

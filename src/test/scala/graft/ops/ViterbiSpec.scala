package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Viterbi decoding against exhaustive path enumeration (all 2^n state
  * sequences), including the tie rule: among optimal paths the DP
  * returns the one minimizing (s_n, ..., s_1) — state 0 preferred at
  * every argmax, resolved from the end.
  */
class ViterbiSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stay = -1L
  private val switch = -4L

  /** Exhaustive reference: best-scoring path, ties broken by the
    * reversed-lexicographic rule the backtrack implements.
    */
  private def brute(e0: Seq[Long], e1: Seq[Long]): Seq[Int] = {
    val n = e0.length
    val paths = (0 until (1 << n)).map(m => (0 until n).map(i => (m >> i) & 1))
    def score(p: Seq[Int]): Long = {
      val em = p.zipWithIndex.map { case (s, i) => if (s == 0) e0(i) else e1(i) }.sum
      val tr = p.sliding(2).collect { case Seq(a, b) =>
        if (a == b) stay else switch
      }.sum
      em + (if (n > 1) tr else 0L)
    }
    val best = paths.map(p => (p, score(p))).sortBy(-_._2).head._2
    paths.filter(score(_) == best)
      .minBy(_.reverse.map(_.toString).mkString)
  }

  private def run(seqs: Map[Long, (Seq[Long], Seq[Long])]): Map[Long, Seq[Int]] = {
    val rows = seqs.toSeq.flatMap { case (uid, (e0, e1)) =>
      e0.indices.map { i =>
        (uid, new Timestamp(1700000000000L + i * 1000L),
          uid * 1000 + i, e0(i), e1(i))
      }
    }
    Viterbi.decode(rows.toDF("user_id", "ts", "event_id", "e0", "e1"))
      .as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1)
      .map { case (u, rs) => u -> rs.sortBy(_._2).map(_._4).toSeq }
  }

  test("clear-cut segmentation: strong emissions dominate the switch cost") {
    // state 0 strongly favored for 3 steps, then state 1 for 3 steps
    val e0 = Seq(0L, 0L, 0L, -10L, -10L, -10L)
    val e1 = Seq(-10L, -10L, -10L, 0L, 0L, 0L)
    run(Map(1L -> ((e0, e1)))) shouldBe Map(1L -> Seq(0, 0, 0, 1, 1, 1))
  }

  test("switch cost smooths over a single contrary observation") {
    // one mildly-1-favoring step inside a 0 run: cheaper to mislabel it
    // than to pay two switches (2*4 > 2)
    val e0 = Seq(0L, -2L, 0L, 0L)
    val e1 = Seq(-9L, 0L, -9L, -9L)
    run(Map(1L -> ((e0, e1)))) shouldBe Map(1L -> Seq(0, 0, 0, 0))
  }

  test("all-tied scores resolve to the all-zero path") {
    val e = Seq(0L, 0L, 0L)
    run(Map(1L -> ((e, e)))) shouldBe Map(1L -> Seq(0, 0, 0))
  }

  test("matches exhaustive enumeration on random multi-user sequences") {
    val rnd = new scala.util.Random(23)
    val seqs = (1L to 8L).map { uid =>
      val n = 1 + rnd.nextInt(10)
      val e0 = Seq.fill(n)(-rnd.nextInt(6).toLong)
      val e1 = Seq.fill(n)(-rnd.nextInt(6).toLong)
      uid -> ((e0, e1))
    }.toMap
    val got = run(seqs)
    val want = seqs.map { case (u, (e0, e1)) => u -> brute(e0, e1) }
    got shouldBe want
  }
}

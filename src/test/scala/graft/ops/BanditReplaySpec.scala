package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Epsilon-greedy replay against a serial reference (same integer
  * policy single-threaded), plus the replay-method invariants: only
  * policy-matching events count, unpulled arms are tried optimistically
  * first, and the reward-greedy arm dominates pulls once estimates
  * separate.
  */
class BanditReplaySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val arms = BanditReplay.Arms
  private val S = 1000000L

  private def run(rows: Seq[(Long, Timestamp, Long, String, Double)])
      : Map[(Long, String), (Long, Long)] =
    BanditReplay.replay(
      rows.toDF("user_id", "ts", "event_id", "event_type", "value"))
      .as[(Long, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  private def ex(uid: Long, rn: Long): Long =
    graft.functions.Md5Prefix60.hash60(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"$uid:$rn"))

  private def serial(rows: Seq[(Long, Timestamp, Long, String, Double)])
      : Map[(Long, String), (Long, Long)] = {
    val k = arms.length
    val out = scala.collection.mutable.Map.empty[(Long, String), (Long, Long)]
    rows.groupBy(_._1).foreach { case (uid, evs) =>
      val n = Array.fill(k)(0L)
      val s = Array.fill(k)(0L)
      var t = 0L
      evs.sortBy(e => (e._2.getTime, e._3)).foreach { e =>
        t += 1
        val arm = arms.indexOf(e._4)
        val h = ex(uid, t)
        val sel =
          if (h % 8 == 0) ((h / 8) % k).toInt
          else (0 until k).maxBy(i =>
            (if (n(i) == 0) 2 * S else s(i) * S / n(i), -i))
        if (sel == arm) { n(sel) += 1; s(sel) += (if (e._5 >= 260.0) 1L else 0L) }
      }
      arms.zipWithIndex.foreach { case (a, i) =>
        out((uid, a)) = (n(i), s(i))
      }
    }
    out.toMap
  }

  private def mk(uid: Long, i: Int, tpe: String, v: Double) =
    (uid, new Timestamp(1700000000000L + i * 60000L), i.toLong, tpe, v)

  test("matches the serial policy on random logs") {
    val rnd = new scala.util.Random(47)
    val rows = for {
      uid <- 0L until 12L
      i <- 0 until 80
    } yield mk(uid, (uid * 80 + i).toInt,
      arms(rnd.nextInt(arms.length)),
      if (rnd.nextInt(4) == 0) 300.0 else 100.0)
    run(rows) shouldBe serial(rows)
  }

  test("replay method: pulls never exceed logged occurrences per arm") {
    val rnd = new scala.util.Random(53)
    val rows = (0 until 200).map(i =>
      mk(1L, i, arms(rnd.nextInt(arms.length)), 100.0))
    val got = run(rows)
    arms.foreach { a =>
      got((1L, a))._1 should be <= rows.count(_._4 == a).toLong
    }
  }

  test("greedy convergence: the only rewarded arm dominates exploit pulls") {
    // 'click' always rewards, everything else never does; uniform log
    val rnd = new scala.util.Random(59)
    val rows = (0 until 400).map { i =>
      val a = arms(rnd.nextInt(arms.length))
      mk(2L, i, a, if (a == "click") 500.0 else 100.0)
    }
    val got = run(rows)
    val clickPulls = got((2L, "click"))._1
    arms.filterNot(_ == "click").foreach { a =>
      clickPulls should be > got((2L, a))._1
    }
    // and its rewards equal its pulls (every accepted click rewarded)
    got((2L, "click"))._2 shouldBe clickPulls
  }
}

package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Holt linear-trend fold: matches a serial reference of the integer
  * recurrence, tracks a linear ramp (the case plain EMA structurally
  * lags), and is bit-identical under repartitioning.
  */
class HoltSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDf(rows: Seq[(String, Long, Double)]) =
    rows.map { case (s, i, v) =>
      (s, new Timestamp(1700000000000L + i * 60000L), i, v)
    }.toDF("symbol", "ts", "event_id", "value")

  private def serial(ps: Seq[Long]): Seq[(Long, Long)] = {
    var l = 0L; var b = 0L
    ps.zipWithIndex.map { case (p, i) =>
      if (i == 0) { l = p; b = 0L }
      else {
        val lp = l
        l = (2 * p + 8 * (l + b)) / 10
        b = ((l - lp) + 9 * b) / 10
      }
      (l, b)
    }
  }

  test("matches the serial recurrence, including negative-trend series") {
    val down = (0 until 50).map(i => ("D", i.toLong, 500.0 - i * 7.3))
    val up = (0 until 50).map(i => ("U", i.toLong + 100, 10.0 + i * 3.1))
    val out = Holt.smooth(mkDf(down ++ up))
      .orderBy("event_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    val expD = serial(down.map(r => math.floor(r._3 * 100 + 0.5).toLong))
    val expU = serial(up.map(r => math.floor(r._3 * 100 + 0.5).toLong))
    out.take(50).map(r => (r._3, r._4)) should
      contain theSameElementsInOrderAs expD
    out.drop(50).map(r => (r._3, r._4)) should
      contain theSameElementsInOrderAs expU
    // the downtrend series must learn a negative trend
    out(49)._4 should be < 0L
  }

  test("tracks a linear ramp: late forecasts sit within 2% of actuals") {
    val ramp = (0 until 200).map(i => ("R", i.toLong, 100.0 + i * 2.0))
    val out = Holt.smooth(mkDf(ramp)).orderBy("event_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    val last = out.last // forecast for step 200: actual would be 100+200*2
    val actualNext = (100.0 + 200 * 2.0) * 100
    math.abs(last._5 - actualNext) / actualNext should be < 0.02
  }

  test("bit-identical under repartitioning") {
    val rnd = new scala.util.Random(7)
    val noisy = (0 until 300).map(i =>
      ("N" + i % 3, i.toLong, 50.0 + rnd.nextGaussian() * 20))
    val df = mkDf(noisy)
    val a = Holt.smooth(df).orderBy("event_id").collect()
    val b = Holt.smooth(df.repartition(11)).orderBy("event_id").collect()
    a should contain theSameElementsInOrderAs b
  }
}

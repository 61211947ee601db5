package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Croston intermittent-demand fold: matches a serial reference of the
  * integer recurrence, separates the size and interval channels (a
  * steady size at doubled sparsity must halve the rate forecast, not
  * the size estimate), and is bit-identical under repartitioning.
  */
class CrostonSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = Croston.S

  private def mkDf(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("series", "dd", "q")

  private def serial(ev: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    // ev: (dd, q) sorted by dd; returns (z, p, f) per demand event
    var z = 0L; var p = 0L; var prev = 0L
    ev.zipWithIndex.map { case ((dd, q), i) =>
      val gap = if (i == 0) 1L else dd - prev
      prev = dd
      if (i == 0) { z = q * S; p = gap * S }
      else { z = (q * S + 3 * z) / 4; p = (gap * S + 3 * p) / 4 }
      (z, p, z * 1000000L / p)
    }
  }

  test("matches the serial recurrence on irregular gaps and sizes") {
    val ev = Seq((10L, 4L), (11L, 2L), (19L, 9L), (20L, 1L), (47L, 6L),
      (48L, 6L), (90L, 30L))
    val out = Croston.forecast(mkDf(ev.map { case (dd, q) => (7L, dd, q) }))
      .orderBy("rn")
      .select("z_fp", "p_fp", "f_fp")
      .as[(Long, Long, Long)].collect()
    out.toSeq should contain theSameElementsInOrderAs serial(ev)
  }

  test("size and interval channels are separate: sparser demand halves " +
    "the rate, not the size estimate") {
    // same demand size 8, series A every day, series B every 4 days
    val a = (0 until 64).map(i => (1L, i.toLong, 8L))
    val b = (0 until 64).map(i => (2L, i.toLong * 4, 8L))
    val out = Croston.forecast(mkDf(a ++ b))
      .filter($"rn" === 64)
      .orderBy("series")
      .select("series", "z_fp", "p_fp", "f_fp")
      .as[(Long, Long, Long, Long)].collect()
    val Array(fa, fb) = out
    // both converge to size 8 (scale S)
    fa._2 shouldBe 8 * S +- (S / 100)
    fb._2 shouldBe 8 * S +- (S / 100)
    // intervals converge to 1 vs 4 -> rate ~8e6 vs ~2e6
    fa._4.toDouble shouldBe 8e6 +- 8e4
    fb._4.toDouble shouldBe 2e6 +- 2e4
  }

  test("first event seeds z = q*S, p = S, f = q*1e6") {
    val out = Croston.forecast(mkDf(Seq((5L, 1000L, 13L))))
      .select("rn", "q", "gap_d", "z_fp", "p_fp", "f_fp")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    out.toSeq shouldBe Seq((1L, 13L, 1L, 13L * S, S, 13000000L))
  }

  test("bit-identical under repartitioning") {
    val rnd = new scala.util.Random(11)
    val rows = for {
      s <- 0L until 7L
      i <- 0 until 40
    } yield (s, i.toLong * (1 + rnd.nextInt(9)), 1L + rnd.nextInt(50))
    // collapse accidental duplicate (series, dd) rows like the caller does
    val df = mkDf(rows).groupBy("series", "dd")
      .agg(org.apache.spark.sql.functions.sum("q").as("q"))
    val a = Croston.forecast(df).orderBy("series", "rn").collect()
    val b = Croston.forecast(df.repartition(13)).orderBy("series", "rn").collect()
    a should contain theSameElementsInOrderAs b
  }
}

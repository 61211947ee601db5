package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Weighted median (q_weighted_median): serial reference of the
  * 2·cumw >= totw definition, the unit-weight = lower-median special
  * case, and dominant-weight pull.
  */
class WeightedMedianSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtureDir(rows: Seq[(Long, Double, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("wmed_fix").toString
    rows.toDF("l_suppkey", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def run(rows: Seq[(Long, Double, Double)]): Map[Long, (Double, Long)] =
    graft.SparkEntry.queries("q_weighted_median")(spark, fixtureDir(rows))
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  /** Serial reference: min v with 2 * cumw(v) >= totw, ties pooled. */
  private def serialWMed(rows: Seq[(Long, Double, Double)]): Map[Long, (Double, Long)] =
    rows.groupBy(_._1).map { case (k, rs) =>
      val wr = rs.map(r => (r._2, math.floor(r._3 * 1e2).toLong))
      val tot = wr.map(_._2).sum
      val med = wr.map(_._1).distinct.sorted.find { v =>
        2 * wr.filter(_._1 <= v).map(_._2).sum >= tot
      }.get
      k -> (med, tot)
    }

  test("matches the serial definition, duplicate values pooled") {
    val rows = Seq[(Long, Double, Double)](
      (1L, 10.0, 1.0), (1L, 20.0, 1.0), (1L, 20.0, 3.0), (1L, 99.0, 2.0),
      (2L, 5.0, 10.0), (2L, 500.0, 1.0), (2L, 700.0, 1.0),
      (3L, 42.0, 0.25))
    run(rows) shouldBe serialWMed(rows)
  }

  test("unit weights reduce to the lower median") {
    val rows = (1 to 9).map(i => (7L, i * 10.0, 1.0))
    run(rows)(7L)._1 shouldBe 50.0 // element 5 of 9
    val even = (1 to 8).map(i => (8L, i * 10.0, 1.0))
    run(even)(8L)._1 shouldBe 40.0 // lower median of an even count
  }

  test("a dominant weight pulls the median to its value") {
    val rows = Seq[(Long, Double, Double)](
      (1L, 1.0, 1.0), (1L, 2.0, 1.0), (1L, 3.0, 1.0), (1L, 1000.0, 50.0))
    run(rows)(1L)._1 shouldBe 1000.0
  }
}

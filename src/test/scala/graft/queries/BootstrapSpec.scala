package graft.queries

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Poisson-bootstrap SE (q_bootstrap_se): degenerate constant group has
  * SE exactly 0, a known-variance group's bootstrap SE agrees with the
  * analytic sd/√n, and the deterministic weights behave like
  * Poisson(1) in aggregate.
  */
class BootstrapSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtureDir(rows: Seq[(Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("boot_fix").toString
    rows.map { case (id, t, v) =>
      (id, new Timestamp(1700000000000L + id * 1000L), id % 50, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(rows: Seq[(Long, String, Double)]): Map[String, (Long, Long, Long, Long)] =
    graft.SparkEntry.queries("q_bootstrap_se")(spark, fixtureDir(rows))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  test("constant group: every replicate mean is the constant, SE = 0") {
    val rows = (1L to 400L).map(i => (i, "const", 7.25))
    val (nReps, se, mn, mx) = run(rows)("const")
    nReps shouldBe 32L
    se shouldBe 0L
    mn shouldBe 7250000L
    mx shouldBe 7250000L
  }

  test("known-variance group: bootstrap SE tracks sd/sqrt(n)") {
    // deterministic values uniform on [0, 100): sd ≈ 28.87, n = 2000
    // → SE(mean) ≈ 0.6455; bootstrap adds its own replicate noise, so
    // assert the right order and a generous band (B = 32)
    val rows = (1L to 2000L).map(i => (i, "unif", (i * 37 % 1000) / 10.0))
    val (nReps, se, mn, mx) = run(rows)("unif")
    nReps shouldBe 32L
    val seVal = se.toDouble / 1000.0
    seVal should be > 0.3
    seVal should be < 1.2
    // replicate means straddle a band around the true mean (~49.95)
    mn.toDouble / 1e6 should be > 47.0
    mx.toDouble / 1e6 should be < 53.0
    (mx - mn) should be > 0L
  }

  test("deterministic weights behave like Poisson(1) in aggregate") {
    val n = 5000
    val scale = math.pow(2.0, 60)
    val e1 = math.exp(-1.0)
    var cdf = 0.0; var fact = 1.0
    val thresholds = (0 to 7).map { k =>
      if (k > 0) fact *= k
      cdf += e1 / fact
      math.floor(cdf * scale).toLong
    }
    val us = spark.range(1, n + 1)
      .selectExpr("md5p60(concat(CAST(id AS STRING), ':0')) AS u")
      .as[Long].collect()
    val ws = us.map { u =>
      thresholds.indexWhere(u < _) match {
        case -1 => 8; case k => k
      }
    }.toSeq
    val mean = ws.sum.toDouble / n
    mean shouldBe 1.0 +- 0.05 // E[Poisson(1)] = 1
    ws.count(_ == 0).toDouble / n shouldBe e1 +- 0.03 // P(0) = 1/e
  }
}

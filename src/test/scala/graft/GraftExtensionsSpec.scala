package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The spark.sql.extensions deployment path: a fresh session configured
  * with graft.GraftExtensions has the custom functions available in pure
  * SQL with no imperative registration.
  */
class GraftExtensionsSpec extends AnyFunSuite with Matchers {

  test("extension-configured session resolves ewm_avg and vec_dot in SQL") {
    // getOrCreate would hand back the shared test session (whose extensions
    // were fixed at creation), so detach default/active first — the new
    // session reuses the SparkContext but gets its own extension set
    val shared = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions = the programmatic injection hook; the equivalent
    // `--conf spark.sql.extensions=graft.GraftExtensions` form applies at
    // SparkContext creation (spark-submit), which a shared-context test
    // JVM cannot exercise
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      Seq(("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0))
        .toDF("k", "t", "x").createOrReplaceTempView("ext_probe")
      val ema = spark.sql(
        """SELECT ewm_avg(x, 2) OVER (PARTITION BY k ORDER BY t) AS e
          |FROM ext_probe""".stripMargin).collect()
      // span=2 -> alpha=2/3, minPeriods=2: row 1 null, then recursive
      assert(ema.head.isNullAt(0))
      val y2 = (1.0 / 3.0) * 1.0 + (2.0 / 3.0) * 2.0
      ema(1).getDouble(0) shouldBe y2 +- 1e-12
      ema(2).getDouble(0) shouldBe ((1.0 / 3.0) * y2 + (2.0 / 3.0) * 3.0) +- 1e-12

      Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
        .createOrReplaceTempView("ext_vec")
      spark.sql("SELECT vec_dot(a, b) AS d FROM ext_vec")
        .collect().head.getDouble(0) shouldBe 11.0
    } finally {
      // restore the shared TestSpark session for the other suites
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}

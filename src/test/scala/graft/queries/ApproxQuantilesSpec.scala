package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, TestSpark}

/** Error-bound contract of the approximate-quantile scale path
  * (q_quantiles_approx, Greenwald-Khanna sketch) against the exact
  * interpolated percentiles of q_quantiles — the same spec pattern as
  * ApproxDistinctSpec for operators whose oracle story is an error bound
  * rather than a DuckDB hash match.
  *
  * With accuracy 10000 the sketch's rank error is <= 1/10000; on the
  * sf0.01 events table (10k rows, ~2k/group) that is <= ~1 rank, so the
  * approx value must land within the value-span of a couple of ranks. We
  * assert a relative tolerance on the value, wide enough for rank-1
  * displacement on this distribution, tight enough to catch a broken
  * sketch (wrong column, wrong percentile, unmerged partitions).
  */
class ApproxQuantilesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("approx quantiles land within 1% of the exact per-group values") {
    def byType(name: String): Map[String, Seq[Double]] =
      SparkEntry.queries(name)(spark, sfDir)
        .orderBy("event_type").collect()
        .map(r => r.getAs[String]("event_type") ->
          Seq("p25", "p50", "p75", "p95").map(c => r.getAs[Double](c)))
        .toMap
    val exact = byType("q_quantiles")
    val approx = byType("q_quantiles_approx")
    approx.keySet shouldBe exact.keySet
    for (k <- exact.keySet; (e, a) <- exact(k).zip(approx(k))) {
      val tol = 0.01 * math.max(1.0, math.abs(e))
      withClue(s"group $k: exact $e vs approx $a") {
        math.abs(e - a) should be <= tol
      }
    }
  }
}

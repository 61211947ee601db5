package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, TestSpark}

/** q_approx_distinct has no cross-engine oracle (HLL implementations
  * differ), so its accuracy contract is pinned here: within 5% of the
  * exact distinct counts (rsd is configured at 2%).
  */
class ApproxDistinctSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("approx distinct within 5% of exact per group") {
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val exact = SparkEntry.queries("q_distinct_counts")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    approx.keySet shouldBe exact.keySet
    approx.foreach { case (k, (ao, ap)) =>
      val (eo, ep) = exact(k)
      withClue(s"group $k orders: approx=$ao exact=$eo") {
        math.abs(ao - eo).toDouble / eo should be < 0.05
      }
      withClue(s"group $k parts: approx=$ap exact=$ep") {
        math.abs(ap - ep).toDouble / ep should be < 0.05
      }
    }
  }
}

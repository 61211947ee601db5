package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Misra-Gries invariants under real evictions (vocab >> k, unlike the
  * oracle fixture where k exceeds the vocabulary): no false negatives,
  * bounded estimates, and exact two-pass results at any parallelism.
  */
class HeavyHittersSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic skewed stream: 3 hot tokens + a long tail of 200
  private def tokens: Seq[String] = {
    // n = 2080, so with k = 8 the threshold is 260: all three clear it
    val hot = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(280)("gamma")
    val tail = (0 until 1100).map(i => s"t${i % 200}")
    // interleave deterministically so hot tokens aren't one contiguous run
    (hot ++ tail).zipWithIndex.sortBy { case (t, i) => (i * 2654435761L) % 4096 }.map(_._1)
  }

  test("sketch never loses a true heavy hitter and estimates stay in [true - n/k, true]") {
    val df = tokens.toDF("tok")
    val n = tokens.size
    val k = 8
    val exact = tokens.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val sk = HeavyHitters.sketch(df.repartition(7), k)
    sk.size should be <= k - 1
    for ((t, c) <- exact if c > n / k) sk.keySet should contain(t)
    for ((t, est) <- sk) {
      est should be <= exact(t)
      est should be >= exact(t) - n.toLong / k
    }
  }

  test("two-pass exact heavy hitters equal the full groupBy answer at any parallelism") {
    val df = tokens.toDF("tok")
    val n = tokens.size
    val k = 8
    val expected = tokens.groupBy(identity)
      .collect { case (t, xs) if xs.size.toLong * k > n => t -> xs.size.toLong }
      .toSet
    for (parts <- Seq(1, 3, 16)) {
      val got = HeavyHitters.exactHeavyHitters(df.repartition(parts), k)
        .as[(String, Long)].collect().toSet
      got shouldBe expected
    }
    expected.map(_._1) shouldBe Set("alpha", "beta", "gamma")
  }
}

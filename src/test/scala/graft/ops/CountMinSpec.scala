package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Count-Min guarantees on a skewed corpus with real bucket collisions
  * (vocab 203 >> w 64): one-sided error, the epsilon*N bound per hash
  * row, and the bucket-wise merge algebra (sketch of a union == summed
  * sketches of the parts — the property that makes it a distributed
  * aggregate rather than a single-pass stream summary).
  */
class CountMinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = 4
  private val W = 64

  // deterministic skewed stream: 3 hot tokens + a long tail of 200
  private def tokens: Seq[String] = {
    val hot = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(280)("gamma")
    val tail = (0 until 1100).map(i => s"t${i % 200}")
    (hot ++ tail).zipWithIndex.sortBy { case (t, i) => (i * 2654435761L) % 4096 }.map(_._1)
  }

  private def exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("estimates are one-sided: est >= exact for EVERY key, overcount <= e*N/w per row") {
    val df = tokens.toDF("tok").repartition(7)
    val sk = CountMin.sketch(df, "tok", D, W)
    val counts = df.groupBy($"tok").agg(count(lit(1)).as("exact_cnt"))
    val est = CountMin.estimates(sk, counts, "tok", D, W)
      .select($"tok", $"exact_cnt", $"est_cnt").as[(String, Long, Long)].collect()
    est.length shouldBe exact.size
    val n = tokens.size.toLong
    for ((t, ex, e) <- est) {
      ex shouldBe exact(t)
      e should be >= ex
      // standard CM bound: overcount < e*N/w with prob 1 - (1/e)^d over
      // the hash draw; the md5 rows are fixed, so assert the bound holds
      // for this corpus (it does, with room)
      (e - ex) should be <= (math.E * n / W).toLong
    }
  }

  test("bucket-wise sum of per-split sketches equals the whole-corpus sketch") {
    val df = tokens.zipWithIndex.toDF("tok", "idx")
    val a = CountMin.sketch(df.filter($"idx" % 2 === 0), "tok", D, W)
    val b = CountMin.sketch(df.filter($"idx" % 2 === 1), "tok", D, W)
    val merged = a.unionAll(b).groupBy($"i", $"bucket")
      .agg(sum($"cnt").as("cnt"))
    val whole = CountMin.sketch(df, "tok", D, W)
    merged.unionAll(whole).distinct().count() shouldBe whole.count()
  }

  test("hot keys never collide away: estimate of a heavy hitter is within tail noise") {
    val df = tokens.toDF("tok")
    val sk = CountMin.sketch(df, "tok", D, W)
    val hot = Seq("alpha", "beta", "gamma").toDF("tok")
    val est = CountMin.estimates(sk, hot, "tok", D, W)
      .as[(String, Long)].collect().toMap
    est("alpha") should be >= 400L
    est("beta") should be >= 300L
    est("gamma") should be >= 280L
    // even the min row carries at most the colliding tail mass
    est("alpha") should be <= 400L + tokens.size.toLong / 8
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Batch-perceptron trainer: learns a separable vocabulary split, is
  * bit-identical under repartitioning (integer-exact updates), and
  * matches a serial reference implementation of the same synchronous
  * recurrence on a toy corpus.
  */
class PerceptronSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two disjoint vocabularies -> linearly separable in hashed space
  // (collisions possible in 64 dims but the margins still separate
  // for this vocabulary; asserted below rather than assumed)
  private val docs = (0 until 40).map { i =>
    if (i % 2 == 0) (i.toLong, "good clean signal " + ("alpha " * (i % 3 + 1)).trim, 1)
    else (i.toLong, "spam junk noise " + ("zeta " * (i % 3 + 1)).trim, -1)
  }.toDF("id", "text", "y")

  test("separable corpus is fully classified after a few rounds") {
    val out = Perceptron.trainPredict(docs, dims = 64, rounds = 5)
    out.count() shouldBe 40
    out.filter(col("pred") =!= col("y")).count() shouldBe 0
    // margins are nonzero in the learned direction
    out.filter(col("y") * col("margin_fp") <= 0).count() shouldBe 0
  }

  test("bit-identical under repartitioning (synchronous integer updates)") {
    val a = Perceptron.trainPredict(docs, dims = 64, rounds = 3)
      .orderBy("id").collect()
    val b = Perceptron.trainPredict(docs.repartition(13), dims = 64, rounds = 3)
      .orderBy("id").collect()
    a should contain theSameElementsInOrderAs b
  }

  test("matches a serial reference of the synchronous recurrence") {
    val local = docs.as[(Long, String, Int)].collect().toSeq
    val dims = 64
    def feat(text: String): Map[Long, Long] =
      text.split(" ").filter(_.nonEmpty)
        .map(t => graft.functions.Md5Prefix60.hash60(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)) % dims)
        .groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val feats = local.map { case (id, text, y) => (id, y, feat(text)) }
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to 3) {
      val mis = feats.filter { case (_, y, f) =>
        y * f.map { case (d, c) => c * w(d) }.sum <= 0
      }
      val upd = mis.flatMap { case (_, y, f) =>
        f.map { case (d, c) => d -> y * c }
      }.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      w = w ++ upd.map { case (d, u) => d -> (w(d) + u) }
    }
    val expect = feats.map { case (id, y, f) =>
      val m = f.map { case (d, c) => c * w(d) }.sum
      (id, y, m, if (m > 0) 1 else -1)
    }.sortBy(_._1)
    val got = Perceptron.trainPredict(docs, dims = dims, rounds = 3)
      .orderBy("id").as[(Long, Int, Long, Int)].collect().toSeq
    got should contain theSameElementsInOrderAs expect
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.PerceptronServe.Doc

/** The serving scorer is bit-identical to the batch trainPredict scoring
  * pass — same hashed featurization, same integer dot product — both as
  * a plain Dataset map and through a MemoryStream micro-batch replay.
  */
class PerceptronServeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = (0 until 60).map { i =>
    if (i % 2 == 0) (i.toLong, "good clean signal alpha " * (i % 3 + 1), 1)
    else (i.toLong, "spam junk noise zeta " * (i % 3 + 1), -1)
  }.toDF("id", "text", "y")

  test("serving margins ≡ batch scoring margins (batch and streamed)") {
    val dims = 64
    val w = PerceptronServe.weightsArray(
      graft.ops.Perceptron.train(docs, dims, rounds = 3), dims)
    val batch = graft.ops.Perceptron.trainPredict(docs, dims, rounds = 3)
      .select(col("id"), col("margin_fp"), col("pred"))
      .as[(Long, Long, Int)].collect().toSet

    val served = PerceptronServe.scored(
      docs.select(col("id"), col("text")).as[Doc], w)
      .as[(Long, Long, Int)].collect().toSet
    served shouldBe batch

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = PerceptronServe.scored(input.toDS(), w)
      .writeStream.outputMode("append").format("memory")
      .queryName("perc_serve").start()
    try {
      val all = docs.select(col("id"), col("text")).as[Doc].collect().toSeq
      Seq(all.take(25), all.drop(25)).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      val streamed = spark.table("perc_serve")
        .as[(Long, Long, Int)].collect().toSet
      streamed shouldBe batch
    } finally query.stop()
  }
}

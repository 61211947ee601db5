package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Streaming drift monitor ≡ the batch drift computation: running
  * per-token counts survive micro-batch boundaries, the latest emission
  * per token is the exact count, and scoring the stream snapshot against
  * a baseline reproduces the batch contribution formula bit-for-bit.
  */
class DriftStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("stream counts and KL scoring ≡ batch over the same documents") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val baselineDocs = Seq(
        "the quick brown fox", "the lazy dog", "quick quick fox",
        "a calm baseline corpus of plain words")
      val streamDocs = Seq(
        "the drifted corpus speaks differently", "drifted drifted tokens",
        "quick fox still here", "novel vocabulary arrives now",
        "drifted again and again")

      // batch references
      def tokCounts(docs: Seq[String]) = docs.toDF("text")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("n"))
      val baseCounts = tokCounts(baselineDocs)
        .select(col("token"), col("n").as("cb"))
      val batchObserved = tokCounts(streamDocs)
        .select(col("token"), col("n").as("ca"))

      val input = MemoryStream[String]
      val query = DriftStream.counts(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("drift_stream").start()
      try {
        Seq(streamDocs.take(2), streamDocs.slice(2, 3), streamDocs.drop(3))
          .foreach { c => input.addData(c); query.processAllAvailable() }
        // counts are monotone: max emission per token = final count
        val snapshot = spark.table("drift_stream")
          .groupBy("token").agg(max(col("ca")).as("ca"))
        val streamed = snapshot.as[(String, Long)].collect().toSet
        val batch = batchObserved.as[(String, Long)].collect().toSet
        streamed shouldBe batch

        // scoring the snapshot reproduces the batch formula bit-for-bit
        val fromStream = DriftStream.score(snapshot, baseCounts)
          .as[(String, Long, Long, Long)].collect().toSeq
        val fromBatch = DriftStream.score(batchObserved, baseCounts)
          .as[(String, Long, Long, Long)].collect().toSeq
        fromStream should contain theSameElementsInOrderAs fromBatch
        // sanity: the planted drift token dominates
        fromStream.head._1 shouldBe "drifted"
      } finally query.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

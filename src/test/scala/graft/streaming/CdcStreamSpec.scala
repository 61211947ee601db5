package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.CdcStream.Change

/** Streaming CDC apply ≡ batch last-writer-wins, including tombstone
  * winners, out-of-sequence delivery (an older record arriving after a
  * newer one must not win), and uneven micro-batch splits.
  */
class CdcStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("final resolved state ≡ batch argmax under shuffled delivery") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(5)
      val changes = (0 until 300).map { i =>
        Change(
          user_id = i % 17,
          op = if (i % 10 == 0) "D" else "U",
          ts = new Timestamp(1700000000000L + i * 1000L),
          event_id = i.toLong,
          value = rnd.nextDouble() * 100)
      }
      // batch reference: argmax by (ts, event_id), tombstones excluded
      val batch = changes.toDF()
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("op"), col("value")))
          .as("w"))
        .filter(col("w.op") =!= "D")
        .select(col("user_id"), col("w.ts"), col("w.value"))
        .as[(Long, Timestamp, Double)].collect().toSet

      // deliver SHUFFLED (sequence != arrival) across uneven batches
      val shuffled = rnd.shuffle(changes)
      val input = MemoryStream[Change]
      val query = CdcStream.applied(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("cdc_stream").start()
      try {
        Seq(shuffled.take(100), shuffled.slice(100, 101), shuffled.drop(101))
          .foreach { c => input.addData(c); query.processAllAvailable() }
        // emissions per key are monotone in sequence (state only moves
        // forward), so the final resolved state is the max-(ts, event_id)
        // emission — no reliance on sink row order, and the event_id
        // tiebreak covers same-ts supersessions
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("last_ts").desc, col("event_id").desc)
        val streamed = spark.table("cdc_stream")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && !col("deleted"))
          .select(col("user_id"), col("last_ts"), col("last_value"))
          .as[(Long, Timestamp, Double)].collect().toSet
        streamed shouldBe batch
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

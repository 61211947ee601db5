package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.HoltStream.Tick

/** Streaming Holt is bit-exact with the batch fold on an in-order
  * replay, INCLUDING series whose state crosses micro-batch boundaries
  * (level/trend persist in keyed state).
  */
class HoltStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("stream ≡ batch across micro-batch boundaries") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(11)
      val ticks = (0 until 240).map { i =>
        Tick("S" + i % 3, new Timestamp(1700000000000L + i * 60000L),
          i.toLong, 100.0 + rnd.nextGaussian() * 25)
      }
      val batch = graft.ops.Holt.smooth(
        ticks.toDF("symbol", "ts", "event_id", "value"))
        .orderBy("event_id")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq

      val input = MemoryStream[Tick]
      val query = HoltStream.smoothed(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("holt_stream").start()
      try {
        // three uneven batches: state must carry (l, b) across the splits
        Seq(ticks.take(50), ticks.slice(50, 51), ticks.drop(51)).foreach { c =>
          input.addData(c)
          query.processAllAvailable()
        }
        val streamed = spark.table("holt_stream")
          .select("event_id", "p_fp", "l_fp", "b_fp", "forecast_fp")
          .orderBy("event_id")
          .as[(Long, Long, Long, Long, Long)].collect().toSeq
        streamed should contain theSameElementsInOrderAs batch
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

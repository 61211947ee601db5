package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.KalmanStream.Tick

/** Streaming Kalman is bit-exact with the batch fold on an in-order
  * replay, INCLUDING the gain-annealing burn-in crossing micro-batch
  * boundaries (posterior variance persists in keyed state, so a
  * restart mid-burn-in resumes the same gain schedule).
  */
class KalmanStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("stream ≡ batch across micro-batch boundaries") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(29)
      val ticks = (0 until 240).map { i =>
        Tick("S" + i % 3, new Timestamp(1700000000000L + i * 60000L),
          i.toLong, 100.0 + rnd.nextGaussian() * 25)
      }
      val batch = graft.ops.Kalman.filter(
        ticks.toDF("symbol", "ts", "event_id", "value"))
        .orderBy("event_id")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq

      val input = MemoryStream[Tick]
      val query = KalmanStream.filtered(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("kalman_stream").start()
      try {
        // uneven batches splitting INSIDE the burn-in: the annealing
        // variance must carry across the splits
        Seq(ticks.take(4), ticks.slice(4, 5), ticks.drop(5)).foreach { c =>
          input.addData(c)
          query.processAllAvailable()
        }
        val streamed = spark.table("kalman_stream")
          .select("event_id", "p_fp", "x_fp", "pvar_fp", "k_fp")
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

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.HmmStream.Obs

/** Streaming forward filter is bit-exact with the batch
  * [[graft.ops.HmmForward]] fold on an in-order replay, including keys
  * whose (a0, rn) state crosses micro-batch boundaries.
  */
class HmmStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("stream ≡ batch across micro-batch boundaries") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(23)
      val obs = (0 until 180).map { i =>
        Obs(i % 4L, new Timestamp(1700000000000L + i * 45000L), i.toLong,
          1L + rnd.nextInt(9), 1L + rnd.nextInt(9))
      }
      val batch = graft.ops.HmmForward.filter(
        obs.toDF("user_id", "ts", "event_id", "we0", "we1"))
        .orderBy("event_id")
        .as[(Long, Long, Long, Long)].collect().toSeq

      val input = MemoryStream[Obs]
      val query = HmmStream.posteriors(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("hmm_stream").start()
      try {
        // uneven batches, incl. a single-row batch: (a0, rn) must carry
        Seq(obs.take(37), obs.slice(37, 38), obs.drop(38)).foreach { c =>
          input.addData(c)
          query.processAllAvailable()
        }
        val streamed = spark.table("hmm_stream")
          .select("user_id", "rn", "event_id", "p1_fp")
          .orderBy("event_id")
          .as[(Long, Long, Long, Long)].collect().toSeq
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

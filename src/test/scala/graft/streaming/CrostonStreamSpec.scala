package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.CrostonStream.Demand

/** Streaming Croston is bit-exact with the batch fold on an in-order
  * replay, INCLUDING series whose state (size, interval, previous
  * period) crosses micro-batch boundaries.
  */
class CrostonStreamSpec extends AnyFunSuite with Matchers {
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
      // irregular gaps and sizes over 5 series, in period order per key
      val demand = (0L until 5L).flatMap { sid =>
        var day = 0L
        (0 until 50).map { _ =>
          day += 1 + rnd.nextInt(13)
          Demand(sid, day, 1L + rnd.nextInt(40))
        }
      }.sortBy(d => (d.dd, d.series))
      val batch = graft.ops.Croston.forecast(
        demand.toDF("series", "dd", "q"))
        .orderBy("series", "rn")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq

      val input = MemoryStream[Demand]
      val query = CrostonStream.forecasts(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("croston_stream").start()
      try {
        // uneven splits: state must carry (z, p, prev) across them
        Seq(demand.take(60), demand.slice(60, 61), demand.drop(61))
          .foreach { c =>
            input.addData(c)
            query.processAllAvailable()
          }
        val streamed = spark.table("croston_stream")
          .select("series", "rn", "q", "gap_d", "z_fp", "p_fp", "f_fp")
          .orderBy("series", "rn")
          .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
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

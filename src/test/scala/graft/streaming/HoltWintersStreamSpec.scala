package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.HoltWintersStream.HourRow

/** Streaming Holt-Winters is bit-exact with the batch fold on an
  * in-order hourly replay, INCLUDING series whose seasonal-slot state
  * crosses micro-batch boundaries (the m-slot array persists in keyed
  * state) — and on the real q_holt_winters input derivation.
  */
class HoltWintersStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def withRocks[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream ≡ batch across micro-batch boundaries (synthetic)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocks {
      val rnd = new scala.util.Random(13)
      val rows = for {
        sym <- Seq("a", "b"); hb <- 0 until 150
      } yield HourRow(sym, hb.toLong, rnd.nextLong(10001) - 5000L)
      val batch = graft.ops.HoltWinters.smooth(
        rows.map(r => (r.symbol, r.hb, r.p)).toDF("symbol", "hb", "p"))
        .as[(String, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq

      val input = MemoryStream[HourRow]
      val q = HoltWintersStream.smoothed(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("hw_stream").start()
      try {
        // uneven splits: slot 24-cycles straddle the batch boundaries
        Seq(rows.take(70), rows.slice(70, 71), rows.drop(71)).foreach { c =>
          input.addData(c)
          q.processAllAvailable()
        }
        val streamed = spark.table("hw_stream")
          .as[(String, Long, Long, Long, Long, Long, Long)]
          .collect().sortBy(r => (r._1, r._2)).toSeq
        streamed shouldBe batch
      } finally q.stop()
    }
  }

  test("stream ≡ batch on the real hourly derivation (driver table)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocks {
      import org.apache.spark.sql.functions._
      val hours = graft.model.Tables.events(spark, sfDir)
        .select(col("event_type").as("symbol"),
          expr("unix_seconds(ts) div 3600").as("hb"),
          expr("CAST(floor(value * 1e2 + 5e-1) AS BIGINT)").as("c"))
        .groupBy(col("symbol"), col("hb"))
        .agg(sum(col("c")).as("p"))
      val batch = graft.ops.HoltWinters.smooth(hours)
        .as[(String, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq

      val rows = hours.as[HourRow].collect().sortBy(r => (r.symbol, r.hb))
      val input = MemoryStream[HourRow]
      val q = HoltWintersStream.smoothed(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("hw_stream_real").start()
      try {
        rows.grouped(math.max(1, rows.length / 4 + 1)).foreach { c =>
          input.addData(c.toSeq)
          q.processAllAvailable()
        }
        val streamed = spark.table("hw_stream_real")
          .as[(String, Long, Long, Long, Long, Long, Long)]
          .collect().sortBy(r => (r._1, r._2)).toSeq
        streamed shouldBe batch
      } finally q.stop()
    }
  }
}

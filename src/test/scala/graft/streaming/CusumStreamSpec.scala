package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.CusumStream.Tick

/** Streaming CUSUM is bit-exact with the batch fold on an in-order
  * replay, INCLUDING series whose state (ref, su, sl) crosses
  * micro-batch boundaries — and the batch operator itself fires on a
  * planted mean shift and stays quiet on in-band noise.
  */
class CusumStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("batch fold: planted shift alarms after it, flat series never does") {
    import spark.implicits._
    // 30 flat rows at 100.00, then 30 rows at 150.00: each post-shift row
    // adds (5000 - kappa) = 3000 to su; alarm once su > 10000 -> 4th
    // post-shift row (su = 12000), then restart and re-fire every 4 rows
    val ticks = (1 to 60).map { i =>
      ("S", new Timestamp(1700000000000L + i * 60000L), i.toLong,
        if (i <= 30) 100.0 else 150.0)
    }.toDF("symbol", "ts", "event_id", "value")
    val out = graft.ops.CusumAlarm.detect(ticks)
      .orderBy("event_id").collect()
    val alarms = out.filter(_.getAs[Boolean]("alarm")).map(_.getAs[Long]("event_id"))
    alarms.headOption shouldBe Some(34L)
    alarms should contain theSameElementsInOrderAs Seq(34L, 38L, 42L, 46L, 50L, 54L, 58L)
    // pre-shift rows: both statistics pinned at 0
    out.filter(_.getAs[Long]("event_id") <= 30).foreach { r =>
      r.getAs[Long]("su_fp") shouldBe 0L
      r.getAs[Long]("sl_fp") shouldBe 0L
    }
    // a downward shift drives the LOWER statistic
    val down = (1 to 10).map { i =>
      ("D", new Timestamp(1700000000000L + i * 60000L), i.toLong,
        if (i <= 5) 100.0 else 20.0)
    }.toDF("symbol", "ts", "event_id", "value")
    val dAlarms = graft.ops.CusumAlarm.detect(down)
      .filter("alarm").orderBy("event_id").collect()
    dAlarms should not be empty
    dAlarms.head.getAs[Long]("sl_fp") should be > 10000L
  }

  test("stream ≡ batch across micro-batch boundaries") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(23)
      val ticks = (0 until 240).map { i =>
        Tick("S" + i % 3, new Timestamp(1700000000000L + i * 60000L),
          i.toLong, 100.0 + rnd.nextGaussian() * 40)
      }
      val batch = graft.ops.CusumAlarm.detect(
        ticks.toDF("symbol", "ts", "event_id", "value"))
        .orderBy("event_id")
        .as[(Long, Long, Long, Long, Boolean)].collect().toSeq

      val input = MemoryStream[Tick]
      val query = CusumStream.alarmed(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("cusum_stream").start()
      try {
        // three uneven batches: state must carry (ref, su, sl) across splits
        Seq(ticks.take(50), ticks.slice(50, 51), ticks.drop(51)).foreach { c =>
          input.addData(c)
          query.processAllAvailable()
        }
        val streamed = spark.table("cusum_stream")
          .select("event_id", "p_fp", "su_fp", "sl_fp", "alarm")
          .orderBy("event_id")
          .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
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

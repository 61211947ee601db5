package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.StreakStream.Tick

/** Streaming streaks are row-identical to an independent serial fold on
  * an in-order replay, including runs that cross micro-batch
  * boundaries, and the island-count semantics (each >= 3 run counted
  * once, ties break runs) match the batch q_streak contract.
  */
class StreakStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def serial(ticks: Seq[Tick]): Seq[(Long, Long, Long, Long)] =
    ticks.groupBy(_.symbol).toSeq.flatMap { case (_, ts) =>
      var last = 0.0; var cur = 0L; var mx = 0L; var ge3 = 0L
      var started = false
      ts.sortBy(t => (t.ts.getTime, t.event_id)).map { t =>
        cur = if (started && t.value > last) cur + 1 else 0L
        if (cur == 3L) ge3 += 1
        mx = math.max(mx, cur); last = t.value; started = true
        (t.event_id, cur, mx, ge3)
      }
    }.sortBy(_._1)

  test("stream ≡ serial fold across micro-batch boundaries, tie semantics") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(7)
      // ramps (long runs), a tie plateau (runs must break), and noise
      val ticks = (0 until 200).map { i =>
        val v = i % 4 match {
          case 0 => i.toDouble // rising
          case 1 => 50.0 // plateau: tie breaks the run
          case _ => 100.0 + rnd.nextGaussian() * 10
        }
        Tick("S" + i % 3, new Timestamp(1700000000000L + i * 60000L),
          i.toLong, v)
      }
      val expected = serial(ticks)

      val input = MemoryStream[Tick]
      val query = StreakStream.streaks(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("streak_stream").start()
      try {
        // uneven batches: runs must extend across the splits
        Seq(ticks.take(7), ticks.slice(7, 8), ticks.drop(8)).foreach { c =>
          input.addData(c)
          query.processAllAvailable()
        }
        val streamed = spark.table("streak_stream")
          .select("event_id", "cur_streak", "max_streak", "n_streaks_ge3")
          .orderBy("event_id")
          .as[(Long, Long, Long, Long)].collect().toSeq
        streamed should contain theSameElementsInOrderAs expected
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

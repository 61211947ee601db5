package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.TimerSession.Ev

/** Timer-driven sessionization vs batch q_sessions on the driver's real
  * events: every closed session must match (start, end, count,
  * fixed-point sum) exactly — in-batch gap jumps close inline, the rest
  * close by event-time TIMER as the watermark advances; a re-armed
  * session must not double-emit from its stale timer.
  */
class TimerSessionSpec extends AnyFunSuite {
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

  test("timer-closed sessions equal batch q_sessions on the events table") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocks {
      val batch = graft.SparkEntry.queries("q_sessions")(spark, sfDir)
        .select($"user_id", $"session_start", $"session_end",
          $"n_events", $"sum_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

      val events = graft.model.Tables.events(spark, sfDir)
        .select($"event_id", $"user_id", $"ts", $"value")
        .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))

      val input = MemoryStream[Ev]
      val q = TimerSession.sessions(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("timer_sessions").start()
      try {
        // many small batches: timers must close the quiet keys between
        // batches as the watermark advances, not just at the end
        events.grouped(math.max(1, events.length / 6 + 1)).foreach { c =>
          input.addData(c.toSeq)
          q.processAllAvailable()
        }
        val flushTs = new Timestamp(events.last.ts.getTime + 86400L * 1000 * 30)
        input.addData(Seq(Ev(-1L, -1L, flushTs, 0.0)))
        q.processAllAvailable()
        // push the watermark PAST the sentinel's own session close so
        // even the sentinel key drains (keeps the no-leftover check honest)
        input.addData(Seq(Ev(-2L, -2L,
          new Timestamp(flushTs.getTime + 86400L * 1000 * 30), 0.0)))
        q.processAllAvailable()

        val streamed = spark.table("timer_sessions")
          .filter($"user_id" >= 0)
          .select($"user_id", $"session_start", $"session_end",
            $"n_events", $"sum_value")
          .as[(Long, Timestamp, Timestamp, Long, Double)].collect()

        // no duplicate emissions (stale timers must be inert)
        assert(streamed.length == streamed.distinct.length)
        val streamedMap =
          streamed.map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
        assert(streamedMap.size == streamed.length)
        assert(streamedMap == batch)
      } finally q.stop()
    }
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming session_window sessionization vs the batch q_sessions
  * gaps-and-islands on the driver's real events: every closed session
  * must match (start, end, count, fixed-point sum) exactly, across
  * micro-batch boundaries, including the exact-gap boundary semantics.
  */
object SessionStreamSpec {
  final case class Ev(event_id: Long, user_id: Long, ts: Timestamp, value: Double)
}

class SessionStreamSpec extends AnyFunSuite {
  import SessionStreamSpec.Ev

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("streamed sessions equal batch q_sessions on the events table") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // batch truth keyed by (user_id, session_start)
    val batch = graft.SparkEntry.queries("q_sessions")(spark, sfDir)
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"sum_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

    val events = graft.model.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"ts", $"value")
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))

    val input = MemoryStream[Ev]
    val query = SessionStream.sessions(input.toDS().toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("session_stream").start()
    try {
      events.grouped(math.max(1, events.length / 4 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      // sentinel far past the horizon closes every open session
      val flushTs = new Timestamp(events.last.ts.getTime + 86400L * 1000 * 30)
      input.addData(Seq(Ev(-1L, -1L, flushTs, 0.0)))
      query.processAllAvailable()

      val streamed = spark.table("session_stream")
        .filter($"user_id" >= 0)
        .select($"user_id", $"session_start", $"session_end", $"n_events", $"sum_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

      assert(streamed.size == batch.size,
        s"session count: streamed ${streamed.size} vs batch ${batch.size}")
      assert(streamed == batch)
    } finally query.stop()
  }

  test("exact-gap boundary: an event exactly gap after the previous stays in-session (batch semantics)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    def plusUs(us: Long) = { // microsecond-precise (Timestamp.getTime is ms-only)
      val totalUs = t0.getTime * 1000L + us
      val t = new Timestamp(totalUs / 1000000L * 1000L)
      t.setNanos(((totalUs % 1000000L) * 1000L).toInt)
      t
    }

    val input = MemoryStream[Ev]
    // tiny gap so the fixture is readable: 60s
    val query = SessionStream.sessions(input.toDS().toDF(), gapUs = 60000000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("session_boundary").start()
    try {
      input.addData(Seq(
        Ev(1, 7, t0, 1.0),
        Ev(2, 7, plusUs(60000000L), 1.0), // exactly one gap later
        Ev(3, 7, plusUs(60000000L + 60000001L), 1.0))) // one gap + 1us: new session
      query.processAllAvailable()
      input.addData(Seq(Ev(-1, -1, Timestamp.valueOf("2024-03-02 10:00:00"), 0.0)))
      query.processAllAvailable()
      val sessions = spark.table("session_boundary")
        .filter($"user_id" === 7).select($"n_events".cast("long"))
        .as[Long].collect().sorted.toSeq
      // batch q_sessions semantics: diff > gap starts a new session, so
      // events 1+2 share a session and event 3 opens a new one
      assert(sessions == Seq(1L, 2L), s"got $sessions")
    } finally query.stop()
  }
}

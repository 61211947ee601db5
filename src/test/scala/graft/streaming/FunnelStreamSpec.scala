package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.FunnelStream.FunnelEvent

/** Streaming funnel vs the batch q_funnel chaining on the driver's real
  * events table: replaying in event-time order across micro-batch
  * boundaries must land every user on the batch funnel_stage.
  */
class FunnelStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("final streamed stage equals batch q_funnel for every user") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val batch = graft.SparkEntry.queries("q_funnel")(spark, sfDir)
      .select("user_id", "funnel_stage")
      .as[(Long, Int)].collect().toMap

    val events = graft.model.Tables.events(spark, sfDir)
      .filter(col("event_type").isin(FunnelStream.Steps: _*))
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[FunnelEvent]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_type)) // event-time replay

    val input = MemoryStream[FunnelEvent]
    val query = FunnelStream.funnelStream(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_stream").start()
    try {
      // three micro-batches: state must carry chains across boundaries
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      val streamed = spark.table("funnel_stream")
        .groupBy("user_id")
        .agg(max(col("funnel_stage")).as("stage"))
        .as[(Long, Int)].collect().toMap

      // every user with stage >= 1 must match; stage-0 users emit nothing
      val expectedReached = batch.filter(_._2 >= 1)
      assert(streamed == expectedReached)
    } finally query.stop()
  }

  test("transitions are strictly ordered and timestamps chain") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")

    val input = MemoryStream[FunnelEvent]
    val query = FunnelStream.funnelStream(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_small").start()
    try {
      // purchase before click: must NOT advance; then the proper chain
      input.addData(Seq(
        FunnelEvent(1, "purchase", ts(0)),
        FunnelEvent(1, "view", ts(1))))
      query.processAllAvailable()
      input.addData(Seq(
        FunnelEvent(1, "click", ts(2)),
        FunnelEvent(1, "purchase", ts(3)),
        FunnelEvent(1, "purchase", ts(4)))) // second purchase: no-op
      query.processAllAvailable()

      val rows = spark.table("funnel_small")
        .select("user_id", "funnel_stage", "stage_ts")
        .as[(Long, Int, Timestamp)].collect().sortBy(_._2)
      assert(rows.toSeq == Seq(
        (1L, 1, ts(1)), (1L, 2, ts(2)), (1L, 3, ts(3))))
    } finally query.stop()
  }
}

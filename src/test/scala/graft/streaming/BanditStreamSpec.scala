package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.BanditStream.Ev

/** Streaming bandit replay is bit-exact with the batch q_bandit_replay
  * scorecards on an in-order per-key delivery, including position
  * counters that cross micro-batch boundaries.
  */
class BanditStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("stream ≡ batch replay across micro-batch boundaries") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.functions._
      val events = graft.model.Tables.events(spark, sfDir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
      val batch = graft.ops.BanditReplay.replay(events)
        .as[(Long, String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

      val rows = events.as[Ev].collect()
        .sortBy(e => (e.ts.getTime, e.event_id))
      val input = MemoryStream[Ev]
      val q = BanditStream.scorecards(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("bandit_stream").start()
      try {
        rows.grouped(math.max(1, rows.length / 4 + 1)).foreach { c =>
          input.addData(c.toSeq)
          q.processAllAvailable()
        }
        val streamed = spark.table("bandit_stream")
          .withColumn("rid", monotonically_increasing_id())
          .orderBy(col("rid"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1)) ->
            (r.getLong(2), r.getLong(3)))
          .toMap // later emissions overwrite earlier per (user, arm)
        streamed shouldBe batch
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

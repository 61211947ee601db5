package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.ops.Rollup

case class RollupEv(event_type: String, day: java.sql.Date, value: Double)

/** The streaming rollup must end at exactly the batch recompute, survive
  * batch retries without double counting, and prune old snapshots.
  */
class RollupStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private lazy val events =
    graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))

  private def finished(df: DataFrame): Set[Seq[Any]] =
    Rollup.finish(df).collect().map(_.toSeq.toVector: Seq[Any]).toSet

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_rollup_stream").toString

  test("replayed stream ends at the full batch recompute bit-for-bit") {
    import spark.implicits._
    val store = tmp() + "/store"
    val ckpt = tmp() + "/ckpt"
    val rows = events.as[RollupEv].orderBy("day", "event_type").collect()
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[RollupEv]
    val q = RollupStream.start(
      input.toDF(), store, Seq("event_type", "day"), "value", ckpt)
    try {
      rows.grouped(math.max(1, rows.length / 4)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = RollupStream.snapshot(spark, store).get
    finished(got) shouldBe finished(
      Rollup.summarize(events, Seq("event_type", "day"), "value"))
  }

  test("a retried batch is idempotent: re-running the same batchId changes nothing") {
    val store = tmp() + "/store"
    val keys = Seq("event_type", "day")
    val b0 = events.filter(col("value") >= 0)
    val b1 = events.filter(col("value") < 0)
    RollupStream.processBatch(store, keys, "value")(b0, 0L)
    RollupStream.processBatch(store, keys, "value")(b1, 1L)
    val once = finished(RollupStream.snapshot(spark, store).get)
    // engine retries batch 1 (e.g. failure after a partial commit)
    RollupStream.processBatch(store, keys, "value")(b1, 1L)
    finished(RollupStream.snapshot(spark, store).get) shouldBe once
    // and the end state is the full recompute
    once shouldBe finished(Rollup.summarize(events, keys, "value"))
  }

  test("old snapshots are pruned to keepVersions") {
    val store = tmp() + "/store"
    val keys = Seq("event_type", "day")
    for (i <- 0 until 6)
      RollupStream.processBatch(store, keys, "value", keepVersions = 2)(
        events.filter(pmod(col("value").cast("long"), lit(6)) === i), i.toLong)
    val vs = RollupStream.versions(spark, store)
    vs.length should be <= 3 // current + keepVersions-1 predecessors
    vs.last shouldBe 5L
  }
}

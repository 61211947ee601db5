package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.NearDup
import graft.streaming.DocStream.DocEvent

/** Streaming MinHash near-dup gate: the row-local signature must equal
  * the batch operator's, and the chained transformWithState stages must
  * flag exactly the documents whose bands collide with an EARLIER doc —
  * across micro-batch boundaries (state persists) and within one batch
  * (arrival order resolves deterministically).
  */
class NearDupGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("row-local minhash bands equal the batch aggregation's bands") {
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
    val batch = NearDup.minhashBands(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val rowLocal = NearDup.withRowMinhashBands(docs)
      .select(col("doc_id"),
        posexplode(expr("array(band_0, band_1, band_2, band_3)"))
          .as(Seq("band_id", "band_hash")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .filterNot(_._3.startsWith("uniq-")) // short docs: batch omits them
      .toSet
    assert(rowLocal == batch)
  }

  test("gate flags docs colliding with earlier arrivals, across and within batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(m: Int) = Timestamp.valueOf(f"2024-04-01 09:$m%02d:00")
      val base = (1 to 30).map(i => s"tok$i").mkString(" ")
      // near-dup of base: one token changed late in the doc (most
      // shingles shared -> some minhash band almost surely collides)
      val nearDup = ((1 to 29).map(i => s"tok$i") :+ "CHANGED").mkString(" ")
      val unrelated = (1 to 30).map(i => s"other$i").mkString(" ")
      val short = "tiny doc" // < 3 tokens: sentinel bands, never collides

      val events = Seq(
        DocEvent(10, ts(0), "en", base),
        DocEvent(11, ts(1), "en", unrelated),
        DocEvent(12, ts(2), "en", nearDup),   // vs doc 10, later batch
        DocEvent(13, ts(3), "en", base),      // exact dup, same batch as 14
        DocEvent(14, ts(4), "en", short))

      // expectation from the BATCH operator: doc is flagged iff it shares
      // a band with an earlier-arriving doc
      val bands = NearDup
        .minhashBands(events.map(e => (e.doc_id, e.text)).toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2)))
      val expect = events.map { e =>
        val mine = bands.filter(_._1 == e.doc_id).map(_._2).toSet
        val earlier = bands.filter(b => b._1 < e.doc_id).map(_._2).toSet
        e.doc_id -> mine.exists(earlier.contains)
      }.toMap

      val input = MemoryStream[DocEvent]
      val query = DocStream.nearDupGate(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("near_dup_gate").start()
      try {
        input.addData(events.take(2))
        query.processAllAvailable()
        input.addData(events.drop(2)) // 12 collides cross-batch, 13 in-batch
        query.processAllAvailable()
        val got = spark.table("near_dup_gate").collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_near_dup"))
          .toMap
        assert(got == expect, s"streaming verdicts $got != batch-derived $expect")
        // sanity on the scenario itself: the near-dup and exact-dup ARE
        // flagged, the unrelated and short docs are NOT
        assert(got(12) && got(13) && !got(11) && !got(14) && !got(10))
      } finally query.stop()
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("TTL bounds the inverted index: an expired band no longer collides") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val text = (1 to 30).map(i => s"tok$i").mkString(" ")
      def ev(id: Long, m: Int) =
        DocEvent(id, Timestamp.valueOf(f"2024-04-01 10:$m%02d:00"), "en", text)
      val input = MemoryStream[DocEvent]
      // Processing-time TTL makes every batch "require another batch"
      // (TransformWithStateExec.shouldRunAnotherBatch), so
      // processAllAvailable never observes quiescence — pace the trigger
      // and poll the sink with a deadline instead.
      val query = DocStream
        .nearDupGate(input.toDS(), ttl = Some(java.time.Duration.ofMillis(300)))
        .writeStream.outputMode("append").format("memory")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
        .queryName("near_dup_ttl").start()
      def verdicts(): Map[Long, Boolean] =
        spark.table("near_dup_ttl").collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_near_dup"))
          .toMap
      def awaitDoc(id: Long, deadlineMs: Long = 60000): Map[Long, Boolean] = {
        val end = System.nanoTime() + deadlineMs * 1000000L
        var got = verdicts()
        while (!got.contains(id) && System.nanoTime() < end) {
          query.exception.foreach(throw _)
          Thread.sleep(100)
          got = verdicts()
        }
        assert(got.contains(id), s"doc $id never reached the sink: $got")
        got
      }
      try {
        input.addData(Seq(ev(1, 0)))
        awaitDoc(1)
        Thread.sleep(800) // let the 300 ms processing-time TTL expire
        input.addData(Seq(ev(2, 1))) // identical text, but the index forgot
        val got = awaitDoc(2)
        assert(got == Map(1L -> false, 2L -> false),
          s"expired band must not collide: $got")
      } finally query.stop()
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.DocStream.DocEvent

/** Streaming paragraph-dedup gate: must be row-identical to the batch
  * [[graft.ops.ParaDedup]] when documents arrive in doc_id order —
  * across micro-batch boundaries (paragraph state persists) and within
  * one batch (the (ingest_ts, doc_id, pos) fold order resolves same-batch
  * repeats to the earliest occurrence, exactly like the batch argmin).
  */
class ParaDedupGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("row-identical to batch ParaDedup across and within micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocksDb {
      def ts(m: Int) = Timestamp.valueOf(f"2024-04-01 09:$m%02d:00")
      val header = "license src terms apply"
      val events = Seq(
        DocEvent(1, ts(0), "en", s"$header\n\nalpha body one\n\nshared footer"),
        DocEvent(2, ts(1), "en", s"$header\n\nbeta body two\n\nshared footer"),
        // same-batch pair below: 3 introduces a paragraph 4 repeats
        DocEvent(3, ts(2), "en", "fresh para\n\ngamma body"),
        DocEvent(4, ts(3), "en", s"fresh para\n\n$header"),
        DocEvent(5, ts(4), "en", s"$header\n\nshared footer")) // all dups

      val expected = graft.ops.ParaDedup
        .dedupParagraphs(
          events.map(e => (e.doc_id, e.text)).toDF("doc_id", "text"),
          "doc_id", "text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1)

      val input = MemoryStream[DocEvent]
      val query = DocStream.paraDedupGate(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("para_dedup_gate").start()
      try {
        input.addData(events.take(2))
        query.processAllAvailable()
        input.addData(events.drop(2)) // 3+4 same batch; 5 all-dup
        query.processAllAvailable()
        val got = spark.table("para_dedup_gate").collect()
          .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(4)))
          .sortBy(_._1)
        assert(got.toSeq == expected.toSeq)
        // the all-dup doc came back as the empty string, not dropped
        assert(got.find(_._1 == 5L).exists(r => r._3 == 0L && r._4 == ""))
        // same-batch repeat: doc 3 kept "fresh para", doc 4 lost it
        assert(got.find(_._1 == 3L).exists(_._4.contains("fresh para")))
        assert(got.find(_._1 == 4L).exists(r => !r._4.contains("fresh para")))
      } finally query.stop()
    }
  }

  test("custom separator and single-paragraph pass-through") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocksDb {
      val events = Seq(
        DocEvent(1, Timestamp.valueOf("2024-04-01 09:00:00"), "en", "a|b"),
        DocEvent(2, Timestamp.valueOf("2024-04-01 09:01:00"), "en", "b|c"),
        DocEvent(3, Timestamp.valueOf("2024-04-01 09:02:00"), "en", "solo"))
      val input = MemoryStream[DocEvent]
      val query = DocStream.paraDedupGate(input.toDS(), sep = "|")
        .writeStream.outputMode("append").format("memory")
        .queryName("para_dedup_gate_sep").start()
      try {
        input.addData(events)
        query.processAllAvailable()
        val got = spark.table("para_dedup_gate_sep").collect()
          .map(r => r.getLong(0) -> r.getString(4)).toMap
        assert(got(1L) == "a|b")
        assert(got(2L) == "c")
        assert(got(3L) == "solo")
      } finally query.stop()
    }
  }
}

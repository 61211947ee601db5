package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.DocStream.DocEvent

/** Stream-static cross-dedup gate: verdicts must agree bit-for-bit with
  * the batch q_cross_dedup operator on the same incoming/corpus split,
  * regardless of arrival batching; docs too short to shingle never
  * match; re-delivery is stateless (same verdict again).
  */
class CrossDedupGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")

  test("gate verdicts == batch q_cross_dedup on the sf0.001 split") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.model.Tables.documents(spark, sfDir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val index = CrossDedupGate.corpusIndex(corpus)

    val incoming = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .zipWithIndex
      .map { case (r, i) =>
        DocEvent(r.getLong(0), ts(i % 60), r.getString(1), r.getString(2)) }

    val input = MemoryStream[DocEvent]
    val query = CrossDedupGate.gate(input.toDS(), index)
      .writeStream.outputMode("append").format("memory")
      .queryName("xdedup_gate").start()
    try {
      // arrival batching must not matter: deliver in 3 uneven chunks
      incoming.grouped(math.max(1, incoming.length / 3)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        query.processAllAvailable()
      }
      val got = spark.table("xdedup_gate")
        .select("doc_id", "matched_corpus_id", "is_dup").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
        .toSet

      val batch = graft.SparkEntry.queries("q_cross_dedup")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
        .toSet
      assert(got == batch)
      assert(got.nonEmpty)
    } finally {
      query.stop()
      spark.catalog.dropTempView("xdedup_gate")
    }
  }

  test("short docs never match; re-delivery is stateless") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val index = CrossDedupGate.corpusIndex(corpus)

    val input = MemoryStream[DocEvent]
    val query = CrossDedupGate.gate(input.toDS(), index)
      .writeStream.outputMode("append").format("memory")
      .queryName("xdedup_small").start()
    try {
      val dup = DocEvent(1, ts(0), "en",
        "alpha beta gamma delta epsilon zeta eta theta")
      val short = DocEvent(2, ts(1), "en", "xy")
      val fresh = DocEvent(3, ts(2), "en",
        "completely different words nothing shared at all here ok")
      input.addData(Seq(dup, short, fresh))
      query.processAllAvailable()
      // stateless: the same doc delivered again gets the same verdict row
      input.addData(Seq(dup))
      query.processAllAvailable()

      val rows = spark.table("xdedup_small")
        .select("doc_id", "matched_corpus_id", "is_dup").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
      assert(rows.count(_ == ((1L, Some(100L), true))) == 2)
      assert(rows.contains((2L, None, false)))
      assert(rows.contains((3L, None, false)))
    } finally {
      query.stop()
      spark.catalog.dropTempView("xdedup_small")
    }
  }
}

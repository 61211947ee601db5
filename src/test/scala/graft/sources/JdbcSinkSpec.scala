package graft.sources

import java.sql.Timestamp
import java.util.Properties

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.EnrichedCandle

/** JDBC sink against embedded Derby (the one JDBC engine available in
  * /opt/spark/jars) — a real round-trip through Spark's executor-side
  * JDBC writer plus the replayed-batch suppression contract of the
  * foreachBatch recipe.
  */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = new Properties()

  private def enriched(sym: String, minute: Int, close: Double) =
    EnrichedCandle(sym, Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"),
      close, close, close, close, 1.0,
      None, None, None, None, None, None, None, None, None, "HOLD")

  test("batch append + read-back round-trip through spark jdbc") {
    import spark.implicits._
    val rows = Seq(enriched("AAA", 1, 1.5), enriched("BBB", 2, 2.5))
    JdbcSink.writeBatch(rows.toDF(), url, props, "stock_rt")
    val back = spark.read.jdbc(url, "stock_rt", props)
      .orderBy("stock_symbol").collect()
    assert(back.length == 2)
    assert(back.map(_.getAs[String]("stock_symbol")).toSeq == Seq("AAA", "BBB"))
    assert(back.map(_.getAs[Double]("close")).toSeq == Seq(1.5, 2.5))
    // nullable indicator columns survive as SQL NULLs
    assert(back.forall(r => r.isNullAt(r.fieldIndex("rsi_10"))))
  }

  test("foreachBatch writer: replayed batchId is a no-op, new batchId appends") {
    import spark.implicits._
    val writer = JdbcSink.exactlyOnceBatchWriter(
      url, props, "stock_eo", "graft_commits", "q_test")
    val b0 = Seq(enriched("AAA", 1, 1.0)).toDF()
    val b1 = Seq(enriched("AAA", 2, 2.0)).toDF()

    writer(b0, 0L)
    writer(b0, 0L) // micro-batch replay after failure: must not duplicate
    assert(spark.read.jdbc(url, "stock_eo", props).count() == 1)

    writer(b1, 1L)
    assert(spark.read.jdbc(url, "stock_eo", props).count() == 2)
    // commit log carries one row per (query, batch)
    assert(spark.read.jdbc(url, "graft_commits", props)
      .filter(col("query_id") === "q_test").count() == 2)
  }

  test("end-to-end: streaming pipeline into the JDBC sink via foreachBatch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[graft.model.Candle]
    val writer = JdbcSink.exactlyOnceBatchWriter(
      url, props, "stock_stream", "graft_commits", "q_stream")
    val query = graft.streaming.StreamingIndicators
      .pipeline(input.toDS(), watermark = "1 hour")
      .writeStream
      .outputMode("append")
      .foreachBatch((ds: org.apache.spark.sql.Dataset[EnrichedCandle], id: Long) =>
        writer(ds.toDF(), id))
      .start()
    try {
      input.addData((1 to 12).map(i =>
        graft.model.Candle("CCC", Timestamp.valueOf(f"2024-01-01 01:$i%02d:00"),
          i, i, i, i, 1.0)))
      query.processAllAvailable()
      val got = spark.read.jdbc(url, "stock_stream", props)
      assert(got.count() == 12)
      // warm-up null semantics survive the JDBC round trip: sma_5 set
      // from row 5 on, null before
      assert(got.filter(col("sma_5").isNotNull).count() == 8)
    } finally query.stop()
  }
}

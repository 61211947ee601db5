package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.DocStream.DocEvent

/** Streamed Count-Min state vs the one-shot batch sketch: after any
  * number of micro-batches, the latest snapshot per hash row must equal
  * [[graft.ops.CountMin]].sketch over everything fed so far — the
  * bucket-wise merge algebra carried across the state store.
  */
class CountMinStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("latest streamed snapshot equals the one-shot batch sketch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val toks =
        Seq.fill(120)("alpha") ++ Seq.fill(90)("beta") ++
          (0 until 400).map(i => s"t${i % 80}")
      val ordered = toks.zipWithIndex
        .sortBy { case (_, i) => (i * 2654435761L) % 8192 }.map(_._1)
      def doc(id: Long, ts: Int, ws: Seq[String]) =
        DocEvent(id, Timestamp.valueOf(f"2024-05-01 09:$ts%02d:00"), "en",
          ws.mkString(" "))
      val batches = ordered.grouped(ordered.size / 3 + 1).toSeq.zipWithIndex
        .map { case (ws, i) => doc(i.toLong, i, ws) }

      val d = 4
      val w = 64
      val input = MemoryStream[DocEvent]
      val query = CountMinStream.sketchStream(input.toDS(), d, w)
        .writeStream.outputMode("append").format("memory")
        .queryName("cm_stream").start()
      try {
        batches.foreach { b => input.addData(b); query.processAllAvailable() }

        // latest snapshot per hash row = rows at that row's max n_row
        val snap = spark.table("cm_stream")
          .withColumn("mx", max(col("n_row")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("i"))))
          .filter(col("n_row") === col("mx"))
          .select(col("i"), col("bucket"), col("cnt"))
          .as[(Int, Long, Long)].collect().toSet

        val batchSketch = graft.ops.CountMin.sketch(
          ordered.toDF("tok"), "tok", d, w)
          .as[(Int, Long, Long)].collect().toSet

        snap shouldBe batchSketch
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

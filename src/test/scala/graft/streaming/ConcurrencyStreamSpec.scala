package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.ConcurrencyStream.{Delta, Gauge}

/** The streaming open-interval gauge matches an independent serial
  * sweep-line row-for-row, including keys whose (day, accumulator,
  * running) state crosses micro-batch boundaries, same-day deltas split
  * across batches, and gap days (no boundary -> no row, the batch
  * convention).
  */
class ConcurrencyStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** Serial reference: net per day, then running sum in day order. */
  private def serialSweep(deltas: Seq[Delta]): Seq[Gauge] =
    deltas.groupBy(_.prio).toSeq.flatMap { case (prio, ds) =>
      var run = 0L
      ds.groupBy(_.day).toSeq.sortBy(_._1).map { case (day, rows) =>
        run += rows.map(_.delta).sum
        Gauge(prio, day, run)
      }
    }

  test("gauge ≡ serial sweep-line across micro-batch boundaries") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(41)
      def day(n: Int): String =
        java.time.LocalDate.of(2024, 1, 1).plusDays(n.toLong).toString
      // intervals over a 40-day window, two keys; deltas delivered in
      // day order (the shared replay contract), split unevenly
      val deltas = (0 until 120).flatMap { i =>
        val prio = "P" + i % 2
        val d0 = rnd.nextInt(40)
        val d1 = d0 + 1 + rnd.nextInt(10)
        Seq(Delta(prio, day(d0), 1L), Delta(prio, day(d1), -1L))
      }.sortBy(_.day)
      val sentinel = Seq(Delta("P0", "9999-12-31", 0L),
        Delta("P1", "9999-12-31", 0L))
      val expected = serialSweep(deltas)
        .sortBy(g => (g.prio, g.day))

      val input = MemoryStream[Delta]
      val query = ConcurrencyStream.gauge(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("gauge_stream").start()
      try {
        Seq(deltas.take(31), deltas.slice(31, 32), deltas.drop(32), sentinel)
          .foreach { c =>
            input.addData(c)
            query.processAllAvailable()
          }
        val streamed = spark.table("gauge_stream")
          .as[Gauge].collect().toSeq.sortBy(g => (g.prio, g.day))
        streamed should contain theSameElementsInOrderAs expected
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

  test("same-day deltas net before the day closes; sentinel day never emits") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Delta]
      val query = ConcurrencyStream.gauge(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("gauge_net").start()
      try {
        // day 01 opens 3 closes 1 (net +2) — split ACROSS batches; the
        // day must not emit until day 02 evidence arrives
        input.addData(Seq(Delta("X", "2024-03-01", 1L),
          Delta("X", "2024-03-01", 1L)))
        query.processAllAvailable()
        spark.table("gauge_net").count() shouldBe 0L
        input.addData(Seq(Delta("X", "2024-03-01", 1L),
          Delta("X", "2024-03-01", -1L)))
        query.processAllAvailable()
        spark.table("gauge_net").count() shouldBe 0L
        input.addData(Seq(Delta("X", "2024-03-02", -1L),
          Delta("X", "9999-12-31", 0L)))
        query.processAllAvailable()
        val got = spark.table("gauge_net").as[Gauge].collect()
          .sortBy(_.day).toSeq
        got shouldBe Seq(
          Gauge("X", "2024-03-01", 2L), Gauge("X", "2024-03-02", 1L))
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

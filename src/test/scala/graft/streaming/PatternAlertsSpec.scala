package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.PatternAlerts.{Alert, Point}

/** Streaming pattern alerts vs a driver-side replay of the same ring
  * fold: alerts fire exactly where the trailing window's distance is
  * within threshold, including windows that SPAN a micro-batch boundary
  * (the ring persists), and series stay independent.
  */
class PatternAlertsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("alerts match a serial replay, across batch boundaries and series") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val w = 4
      val pattern = Array(1.0, 2.0, 3.0, 4.0)
      val patterns = Seq(7L -> pattern)
      val threshold = 0.5

      def ts(m: Int) = Timestamp.valueOf(f"2024-06-01 10:$m%02d:00")
      // series A: ramps into the pattern twice; the second match's window
      // spans the batch split. series B: same shape shifted far away.
      val aVals = Seq(9.0, 1.0, 2.0, 3.0, 4.0, 1.1, 1.9, 3.05, 3.8, 50.0)
      val bVals = aVals.map(_ + 100.0)
      val points =
        aVals.zipWithIndex.map { case (v, i) => Point("A", ts(i), v) } ++
          bVals.zipWithIndex.map { case (v, i) => Point("B", ts(i), v) }

      def expected(series: String, vals: Seq[Double]): Seq[(String, Int, Double)] =
        vals.indices.collect {
          case i if i >= w - 1 =>
            val win = vals.slice(i - w + 1, i + 1)
            val d = win.zip(pattern).foldLeft(0.0) { case (acc, (a, b)) =>
              acc + (a - b) * (a - b)
            }
            (series, i, d)
        }.filter(_._3 <= threshold)
      val expect = (expected("A", aVals) ++ expected("B", bVals))
        .map { case (s, i, d) => (s, ts(i), d) }.toSet
      assert(expect.size == 2, s"scenario should yield 2 alerts: $expect")

      val input = MemoryStream[Point]
      val query = PatternAlerts.alerts(input.toDS(), patterns, threshold, w)
        .writeStream.outputMode("append").format("memory")
        .queryName("pattern_alerts").start()
      try {
        // split mid-ramp: the second matching window needs ring state
        // carried across the boundary
        val (b1, b2) = points.sortBy(p => p.ts.getTime).splitAt(13)
        input.addData(b1); query.processAllAvailable()
        input.addData(b2); query.processAllAvailable()
        val got = spark.table("pattern_alerts").as[Alert].collect()
          .map(a => (a.series, a.ts, a.dist)).toSet
        assert(got == expect, s"alerts $got != $expect")
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

package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Candle
import graft.ops.IncrementalIndicators.{advance, emptySnapshot, enriched, nextSnapshot}

/** Incremental-batch ≡ full-batch contract: folding new partitions on top
  * of a persisted state snapshot must reproduce the full recompute
  * bit-for-bit (the fold IS StreamingIndicators.step, already golden
  * against the window pipeline — here we pin the resume plumbing:
  * snapshot round-trip, passthrough, multi-slice composition).
  */
class IncrementalIndicatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def candle(sym: String, m: Int, close: Double) =
    Candle(sym, new Timestamp(1704067200000L + m * 60000L),
      close, close + 1, close - 1, close, 1.0)

  private def series: Seq[Candle] =
    (0 until 30).map(i => candle("AAA", i, 100.0 + math.sin(i * 0.7) * 5)) ++
      (0 until 25).map(i => candle("BBB", i, 50.0 + (i % 7) * 0.3))

  private def keyOf(c: graft.model.EnrichedCandle) = (c.stock_symbol, c.local_time)

  test("resume from a mid-series snapshot equals the uninterrupted fold, bit-for-bit") {
    import spark.implicits._
    val all = series
    val (first, second) = all.partition(_.local_time.getTime < 1704067200000L + 15 * 60000L)

    // uninterrupted: everything in one advance from empty
    val full = enriched(advance(all.toDS(), emptySnapshot(spark)))
      .collect().map(e => keyOf(e) -> e).toMap

    // resumed: two slices through a snapshot round-trip (parquet, as a
    // production job would persist it)
    val s1 = advance(first.toDS(), emptySnapshot(spark))
    val snapPath = java.nio.file.Files.createTempDirectory("snap").toString
    nextSnapshot(s1).write.mode("overwrite").parquet(snapPath)
    val snap = spark.read.parquet(snapPath)
      .as[IncrementalIndicators.StateRow]
    val s2 = advance(second.toDS(), snap)
    val resumed =
      (enriched(s1).collect() ++ enriched(s2).collect())
        .map(e => keyOf(e) -> e).toMap

    assert(resumed.keySet == full.keySet)
    // scala == on boxed doubles is NUMERIC equality (-0.0 == 0.0), so a
    // true bit-level compare goes through doubleToRawLongBits per field
    def bits(o: Option[Double]): Option[Long] =
      o.map(java.lang.Double.doubleToRawLongBits)
    for (k <- full.keySet) {
      val (r, f) = (resumed(k), full(k))
      val rBits = Seq(r.sma_5, r.ema_10, r.delta, r.gain, r.loss,
        r.avg_gain_10, r.avg_loss_10, r.rs, r.rsi_10).map(bits)
      val fBits = Seq(f.sma_5, f.ema_10, f.delta, f.gain, f.loss,
        f.avg_gain_10, f.avg_loss_10, f.rs, f.rsi_10).map(bits)
      assert(rBits == fBits && r.signal == f.signal,
        s"row $k diverged after resume (bit-level): $r vs $f")
    }
  }

  test("symbols with no new data pass their snapshot through unchanged") {
    import spark.implicits._
    val s1 = advance(series.toDS(), emptySnapshot(spark))
    val snap1 = nextSnapshot(s1).collect().map(s => s.stock_symbol -> s).toMap

    val onlyB = Seq(candle("BBB", 40, 51.5))
    val s2 = advance(onlyB.toDS(), nextSnapshot(s1))
    val snap2 = nextSnapshot(s2).collect().map(s => s.stock_symbol -> s).toMap

    assert(snap2.keySet == Set("AAA", "BBB"))
    val (a1, a2) = (snap1("AAA"), snap2("AAA"))
    assert(a1.obs == a2.obs && a1.ema == a2.ema &&
      a1.prevClose == a2.prevClose &&
      a1.closes.toSeq == a2.closes.toSeq &&
      a1.gains.toSeq == a2.gains.toSeq &&
      a1.losses.toSeq == a2.losses.toSeq)
    assert(snap2("BBB").obs == snap1("BBB").obs + 1)
  }

  test("incremental fold equals the batch window pipeline on the new slice") {
    import spark.implicits._
    val all = series
    val batch = Indicators.enrich(
      all.toDF(), col("stock_symbol"), col("local_time"), col("close"))
      .collect()
      .map(r => (r.getAs[String]("stock_symbol"), r.getAs[Timestamp]("local_time")) ->
        (Option(r.getAs[Any]("ema_10")), Option(r.getAs[Any]("rsi_10")),
          r.getAs[String]("signal")))
      .toMap
    val inc = enriched(advance(all.toDS(), emptySnapshot(spark)))
      .collect()
      .map(e => (e.stock_symbol, e.local_time) ->
        (e.ema_10.map(_.asInstanceOf[Any]), e.rsi_10.map(_.asInstanceOf[Any]), e.signal))
      .toMap
    assert(inc == batch)
  }
}

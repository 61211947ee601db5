package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.HistogramStream.{binAtRank, binOf, Tick}

/** Streaming histogram quantiles equal the exact batch order statistic
  * at bin granularity over every prefix of the stream — per symbol,
  * across uneven micro-batches — and out-of-range values clamp to the
  * edge bins.
  */
class HistogramStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def reference(ticks: Seq[Tick]): Map[String, (Long, Long, Long, Long)] =
    ticks.groupBy(_.symbol).map { case (sym, ts) =>
      val bins = ts.groupBy(t => binOf(t.value))
        .map { case (b, g) => b -> g.size.toLong }
      val n = ts.size.toLong
      sym -> ((n, bins.size.toLong,
        binAtRank(bins, (n + 1) / 2), binAtRank(bins, (9 * n + 9) / 10)))
    }

  test("prefix-exact quantiles across micro-batches, clamping") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(13)
      val ticks = (0 until 300).map { i =>
        val v = i % 10 match {
          case 0 => -5.0 // clamps to bin 0
          case 1 => 99999.0 // clamps to MaxBin
          case _ => rnd.nextDouble() * 500
        }
        Tick("S" + i % 2, new Timestamp(1700000000000L + i * 1000L),
          i.toLong, v)
      }
      val batches = Seq(ticks.take(101), ticks.slice(101, 102), ticks.drop(102))

      val input = MemoryStream[Tick]
      val query = HistogramStream.summaries(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("hist_stream").start()
      try {
        var fed = Seq.empty[Tick]
        batches.foreach { c =>
          val before = spark.table("hist_stream").count()
          input.addData(c)
          query.processAllAvailable()
          fed = fed ++ c
          val ref = reference(fed)
          // the latest emission per touched symbol equals the batch
          // statistic over the prefix fed so far
          val latest = spark.table("hist_stream")
            .orderBy($"symbol")
            .as[(String, Long, Long, Long, Long)].collect()
            .groupBy(_._1).map { case (s, rows) =>
              // rows per symbol are cumulative; the max-n row is latest
              s -> rows.maxBy(_._2)
            }
          c.map(_.symbol).distinct.foreach { sym =>
            val (n, nb, p50, p90) = ref(sym)
            latest(sym) shouldBe ((sym, n, nb, p50, p90))
          }
          before should be < spark.table("hist_stream").count()
        }
        // edge bins present: clamped values landed on 0 and MaxBin
        val ref = reference(fed)
        ref.values.foreach { case (_, nb, _, _) => nb should be >= 3L }
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

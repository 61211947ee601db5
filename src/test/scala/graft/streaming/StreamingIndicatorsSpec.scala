package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Candle
import graft.ops.Indicators

class StreamingIndicatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkCandles(sym: String, closes: Seq[Double]): Seq[Candle] =
    closes.zipWithIndex.map { case (c, i) =>
      Candle(sym, Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        c - 0.5, c + 1.0, c - 1.0, c, 100.0 + i)
    }

  private val symA = mkCandles("AAA",
    Seq(10.0, 12.0, 11.0, 13.0, 12.5, 14.0, 13.0, 15.0, 14.5, 16.0,
      15.0, 17.0, 16.5, 18.0, 17.0, 16.0, 15.5, 14.0, 14.5, 13.0))
  private val symB = mkCandles("BBB",
    Seq(5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0,
      5.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0, 12.0, 13.0))

  test("streaming output is identical to the batch window pipeline") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Candle]
    val query = StreamingIndicators
      .enrichStream(input.toDS())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_golden")
      .start()
    // interleave the two symbols across 3 uneven, ordered batches
    val all = (symA ++ symB).sortBy(c => (c.local_time.getTime, c.stock_symbol))
    input.addData(all.take(7))
    query.processAllAvailable()
    input.addData(all.slice(7, 23))
    query.processAllAvailable()
    input.addData(all.drop(23))
    query.processAllAvailable()
    val got = spark.table("stream_golden")
      .orderBy("stock_symbol", "local_time")
      .collect()
    query.stop()

    val batch = Indicators
      .enrich(
        (symA ++ symB).toDF(),
        col("stock_symbol"), col("local_time"), col("close"))
      .orderBy("stock_symbol", "local_time")
      .collect()

    assert(got.length == batch.length)
    val numCols = Seq("sma_5", "ema_10", "delta", "gain", "loss",
      "avg_gain_10", "avg_loss_10", "rs", "rsi_10")
    got.zip(batch).foreach { case (g, b) =>
      assert(g.getAs[String]("stock_symbol") == b.getAs[String]("stock_symbol"))
      assert(g.getAs[Timestamp]("local_time") == b.getAs[Timestamp]("local_time"))
      numCols.foreach { c =>
        val gv = Option(g.getAs[Any](c)).map(_.asInstanceOf[Double])
        val bv = Option(b.getAs[Any](c)).map(_.asInstanceOf[Double])
        assert(gv.isDefined == bv.isDefined,
          s"$c null-ness at ${g.getAs[Timestamp]("local_time")}: stream=$gv batch=$bv")
        for (x <- gv; y <- bv)
          assert(x == y, s"$c not bit-identical: stream=$x batch=$y")
      }
      assert(g.getAs[String]("signal") == b.getAs[String]("signal"))
    }
  }

  test("dedup gate suppresses re-delivered (symbol, time) rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Candle]
    val query = StreamingIndicators
      .pipeline(input.toDS(), watermark = "10 minutes")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_dedup")
      .start()
    input.addData(symA.take(6))
    query.processAllAvailable()
    // re-deliver rows 2-5 (same keys, possibly mutated payload) + 2 new rows
    input.addData(symA.slice(2, 6) ++ symA.slice(6, 8))
    query.processAllAvailable()
    val got = spark.table("stream_dedup").collect()
    query.stop()
    assert(got.length == 8, s"expected 8 unique rows, got ${got.length}")
    // values must match a clean ordered run (first-delivery wins)
    val clean = symA.take(8).foldLeft(
      (StreamingIndicators.emptyState, List.empty[Double])) {
      case ((st, acc), c) =>
        val (n, e) = StreamingIndicators.step(st, c)
        (n, acc ++ e.sma_5.toList)
    }._2
    val gotSma = got.sortBy(_.getAs[Timestamp]("local_time").getTime)
      .flatMap(r => Option(r.getAs[Any]("sma_5")).map(_.asInstanceOf[Double]))
    assert(gotSma.toSeq == clean)
  }

  test("restart from checkpoint: state carries over, no re-emission") {
    // The reference loses all state on restart and re-emits every record
    // (SURVEY.md §2.8, consumer.py:250 startingOffsets=earliest with no
    // checkpoint). Our pipeline checkpoints state + sink commits: after a
    // stop/restart the EMA/ring-buffer state resumes and the file sink
    // holds each row exactly once.
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_ck").toString
    val ck = s"$base/checkpoint"
    val out = s"$base/out"
    val input = MemoryStream[Candle]
    def startQuery() = StreamingIndicators
      .pipeline(input.toDS(), watermark = "10 minutes")
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ck)
      .start()

    val q1 = startQuery()
    input.addData(symA.take(12))
    q1.processAllAvailable()
    q1.stop()

    val q2 = startQuery()
    input.addData(symA.drop(12))
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(out)
      .orderBy("local_time")
      .collect()
    assert(got.length == symA.length,
      s"expected ${symA.length} rows exactly once, got ${got.length}")

    // post-restart rows continue the pre-restart state: compare every row
    // against a clean serial fold of the full series
    val clean = symA.foldLeft(
      (StreamingIndicators.emptyState, Vector.empty[graft.model.EnrichedCandle])) {
      case ((st, acc), c) =>
        val (n, e) = StreamingIndicators.step(st, c)
        (n, acc :+ e)
    }._2
    got.zip(clean).foreach { case (g, e) =>
      assert(Option(g.getAs[Any]("ema_10")).map(_.asInstanceOf[Double]) == e.ema_10,
        s"ema_10 mismatch at ${g.getAs[Timestamp]("local_time")}")
      assert(Option(g.getAs[Any]("avg_gain_10")).map(_.asInstanceOf[Double]) == e.avg_gain_10)
      assert(g.getAs[String]("signal") == e.signal)
    }
    // rows after the restart boundary must have warm state (ema defined
    // from row 10 onward — only possible if obs count survived restart)
    assert(got.drop(12).forall(r => r.getAs[Any]("ema_10") != null))
  }

  test("transformWithState variant matches the flatMapGroupsWithState output") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Candle]
      val query = StreamingIndicators
        .enrichStreamTWS(input.toDS())
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName("stream_tws")
        .start()
      input.addData(symA.take(12))
      query.processAllAvailable()
      input.addData(symA.drop(12))
      query.processAllAvailable()
      val got = spark.table("stream_tws").orderBy("local_time").collect()
      query.stop()

      val clean = symA.foldLeft(
        (StreamingIndicators.emptyState, Vector.empty[graft.model.EnrichedCandle])) {
        case ((st, acc), c) =>
          val (n, e) = StreamingIndicators.step(st, c)
          (n, acc :+ e)
      }._2
      assert(got.length == clean.length)
      got.zip(clean).foreach { case (g, e) =>
        assert(Option(g.getAs[Any]("ema_10")).map(_.asInstanceOf[Double]) == e.ema_10)
        assert(Option(g.getAs[Any]("rsi_10")).map(_.asInstanceOf[Double]) == e.rsi_10)
        assert(g.getAs[String]("signal") == e.signal)
      }
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState restart: RocksDB state survives stop/start") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_tws_ck").toString
      val input = MemoryStream[Candle]
      def startQuery() = StreamingIndicators
        .enrichStreamTWS(input.toDS())
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ck")
        .start()

      val q1 = startQuery()
      input.addData(symA.take(12))
      q1.processAllAvailable()
      q1.stop()

      val q2 = startQuery()
      input.addData(symA.drop(12))
      q2.processAllAvailable()
      q2.stop()

      val got = spark.read.parquet(s"$base/out").orderBy("local_time").collect()
      assert(got.length == symA.length)
      // EMA defined from row 10 onward proves obs count survived restart
      assert(got.drop(12).forall(_.getAs[Any]("ema_10") != null))
      val clean = symA.foldLeft(
        (StreamingIndicators.emptyState, Vector.empty[graft.model.EnrichedCandle])) {
        case ((st, acc), c) =>
          val (n, e) = StreamingIndicators.step(st, c)
          (n, acc :+ e)
      }._2
      got.zip(clean).foreach { case (g, e) =>
        assert(Option(g.getAs[Any]("ema_10")).map(_.asInstanceOf[Double]) == e.ema_10)
      }
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("rows arriving unordered WITHIN a micro-batch are sorted before folding") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Candle]
    val query = StreamingIndicators
      .enrichStream(input.toDS())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_shuffled")
      .start()
    // one batch, deliberately shuffled delivery order
    val shuffled = new scala.util.Random(7).shuffle(symA.take(12))
    input.addData(shuffled)
    query.processAllAvailable()
    val got = spark.table("stream_shuffled")
      .orderBy("local_time").collect()
    query.stop()

    val clean = symA.take(12).foldLeft(
      (StreamingIndicators.emptyState, Vector.empty[graft.model.EnrichedCandle])) {
      case ((st, acc), c) =>
        val (n, e) = StreamingIndicators.step(st, c)
        (n, acc :+ e)
    }._2
    assert(got.length == clean.length)
    got.zip(clean).foreach { case (g, e) =>
      assert(Option(g.getAs[Any]("sma_5")).map(_.asInstanceOf[Double]) == e.sma_5)
      assert(Option(g.getAs[Any]("ema_10")).map(_.asInstanceOf[Double]) == e.ema_10)
    }
  }

  test("dedup state is bounded: watermark advance evicts old keys") {
    // The reference's `already_sent` set grows forever (consumer.py:27-28).
    // Our dedup keys live in the state store only within the watermark
    // horizon; this asserts eviction actually happens via the state
    // operator metrics.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Candle]
    val query = StreamingIndicators
      .dedupGate(input.toDS(), watermark = "10 minutes")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_evict")
      .start()

    def candleAt(t: String) =
      Candle("AAA", Timestamp.valueOf(t), 1, 1, 1, 1, 1)

    // 50 keys at hour 10
    input.addData((0 until 50).map(i => candleAt(f"2024-01-01 10:00:$i%02d")))
    query.processAllAvailable()
    val grow = query.lastProgress.stateOperators.head.numRowsTotal
    assert(grow >= 50, s"expected >=50 state rows, got $grow")

    // jump event time to hour 13: watermark (12:50) passes all hour-10 keys
    input.addData(Seq(candleAt("2024-01-01 13:00:00")))
    query.processAllAvailable()
    // one more batch so eviction metrics settle
    input.addData(Seq(candleAt("2024-01-01 13:00:01")))
    query.processAllAvailable()
    val after = query.lastProgress.stateOperators.head.numRowsTotal
    query.stop()
    assert(after < 50, s"state not evicted: $after rows still held")
  }

  test("windowed OHLC bars: watermarked tumbling aggregation, late rows dropped") {
    implicit val sqlCtx = spark.sqlContext
    def candle(sym: String, t: String, o: Double, h: Double, l: Double,
        c: Double, v: Double) =
      Candle(sym, Timestamp.valueOf(t), o, h, l, c, v)
    val input = MemoryStream[Candle]
    val query = StreamingIndicators
      .windowedOhlc(input.toDS(), barWidth = "1 hour", watermark = "30 minutes")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_ohlc")
      .start()

    // hour-10 bar for AAA: open=first by time, close=last by time
    input.addData(Seq(
      candle("AAA", "2024-01-01 10:05:00", 10, 12, 9, 11, 1),
      candle("AAA", "2024-01-01 10:45:00", 11, 15, 10, 14, 2),
      candle("AAA", "2024-01-01 10:20:00", 11, 13, 8, 12, 4)))
    query.processAllAvailable()
    // nothing emitted yet: watermark has not passed the window end
    assert(spark.table("stream_ohlc").count() == 0)

    // an hour-13 row pushes the watermark past 11:30 -> hour-10 bar closes
    input.addData(Seq(candle("AAA", "2024-01-01 13:00:00", 20, 20, 20, 20, 1)))
    query.processAllAvailable()
    val bars = spark.table("stream_ohlc").collect()
    assert(bars.length == 1)
    val bar = bars.head
    assert(bar.getAs[Timestamp]("bar_ts") == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(bar.getAs[Double]("open") == 10.0) // 10:05 row
    assert(bar.getAs[Double]("high") == 15.0)
    assert(bar.getAs[Double]("low") == 8.0)
    assert(bar.getAs[Double]("close") == 14.0) // 10:45 row
    assert(bar.getAs[Double]("volume") == 7.0)
    assert(bar.getAs[Long]("n_ticks") == 3L)

    // a late hour-10 row behind the watermark is dropped, not re-aggregated
    input.addData(Seq(candle("AAA", "2024-01-01 10:59:00", 99, 99, 99, 99, 99)))
    query.processAllAvailable()
    assert(spark.table("stream_ohlc").count() == 1)
    query.stop()
  }

  test("stream -> enriched -> day-partitioned store via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val input = MemoryStream[Candle]
    // symA spans one day; add a second-day candle to get 2 partitions
    val day2 = Candle("AAA", Timestamp.valueOf("2024-01-02 00:00:00"),
      1, 1, 1, 1, 1)
    val query = StreamingIndicators.sinkToStore(
      StreamingIndicators.pipeline(input.toDS()),
      s"$base/store", s"$base/ck")
    input.addData(symA.take(10))
    query.processAllAvailable()
    input.addData(symA.drop(10) :+ day2)
    query.processAllAvailable()
    query.stop()

    val back = graft.sources.PartitionedStore.read(spark, s"$base/store")
    assert(back.count() == symA.length + 1)
    assert(back.select("trade_date").distinct().count() == 2)
    // enrichment columns survived the store round-trip
    assert(back.columns.contains("signal"))
    assert(back.filter(col("ema_10").isNotNull).count() > 0)
  }

  test("windowed OHLC equals the batch resampling formulation") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic multi-hour series, unique timestamps per symbol
    val candles = for {
      sym <- Seq("AAA", "BBB")
      h <- 9 to 12
      m <- Seq(1, 17, 43)
    } yield Candle(sym, Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00"),
      h * 10.0 + m * 0.1, h * 10.0 + m * 0.1 + 1, h * 10.0 + m * 0.1 - 1,
      h * 10.0 + m * 0.2, 1.0)

    val input = MemoryStream[Candle]
    val query = StreamingIndicators
      .windowedOhlc(input.toDS(), barWidth = "1 hour", watermark = "1 minute")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_ohlc_eq")
      .start()
    input.addData(candles)
    query.processAllAvailable()
    // close all bars by advancing the watermark far ahead
    input.addData(Seq(Candle("ZZZ",
      Timestamp.valueOf("2024-01-02 00:00:00"), 1, 1, 1, 1, 1)))
    query.processAllAvailable()
    val streamed = spark.table("stream_ohlc_eq")
      .filter(col("stock_symbol") =!= "ZZZ")
      .collect()
      .map(r => (r.getAs[String]("stock_symbol"), r.getAs[Timestamp]("bar_ts")) ->
        (r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"),
          r.getAs[Long]("n_ticks")))
      .toMap
    query.stop()

    // batch formulation (the q_ohlc_bars shape over the same rows)
    val s = spark
    import s.implicits._
    val df = candles.toDF()
    val bar = date_trunc("hour", col("local_time"))
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stock_symbol"), bar).orderBy(col("local_time"))
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stock_symbol"), bar).orderBy(col("local_time").desc)
    val batch = df
      .withColumn("bar_ts", bar)
      .withColumn("rn_a", org.apache.spark.sql.functions.row_number().over(wa))
      .withColumn("rn_d", org.apache.spark.sql.functions.row_number().over(wd))
      .groupBy(col("stock_symbol"), col("bar_ts"))
      .agg(
        org.apache.spark.sql.functions.max(when(col("rn_a") === 1, col("open"))).as("open"),
        org.apache.spark.sql.functions.max(col("high")).as("high"),
        org.apache.spark.sql.functions.min(col("low")).as("low"),
        org.apache.spark.sql.functions.max(when(col("rn_d") === 1, col("close"))).as("close"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_ticks"))
      .collect()
      .map(r => (r.getAs[String]("stock_symbol"), r.getAs[Timestamp]("bar_ts")) ->
        (r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"),
          r.getAs[Long]("n_ticks")))
      .toMap

    assert(streamed == batch,
      s"stream bars != batch bars:\n stream=$streamed\n batch=$batch")
  }

  test("streaming sessionization: gap split, session merge, watermark emit") {
    implicit val sqlCtx = spark.sqlContext
    def candle(t: String, v: Double) =
      Candle("AAA", Timestamp.valueOf(t), v, v, v, v, 1)
    val input = MemoryStream[Candle]
    val query = StreamingIndicators
      .sessionize(input.toDS().toDF(), gap = "30 minutes",
        watermark = "30 minutes")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_sessions")
      .start()

    // session 1: 10:00-10:10 (3 events); session 2 starts 11:00 (>30m gap)
    input.addData(Seq(
      candle("2024-01-01 10:00:00", 1),
      candle("2024-01-01 10:10:00", 2),
      candle("2024-01-01 10:05:00", 3),
      candle("2024-01-01 11:00:00", 10)))
    query.processAllAvailable()
    // push watermark far past session 1's close
    input.addData(Seq(candle("2024-01-01 13:00:00", 99)))
    query.processAllAvailable()
    input.addData(Seq(candle("2024-01-01 15:00:00", 0)))
    query.processAllAvailable()
    val out = spark.table("stream_sessions").collect()
      .sortBy(_.getAs[Timestamp]("window_start").getTime)
    query.stop()

    assert(out.length >= 2, s"expected >=2 closed sessions, got ${out.length}")
    val s1 = out.head
    assert(s1.getAs[Long]("n_events") == 3)
    assert(s1.getAs[Timestamp]("session_start") == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(s1.getAs[Timestamp]("session_end") == Timestamp.valueOf("2024-01-01 10:10:00"))
    assert(s1.getAs[Double]("sum_value") == 6.0)
    // session-window end = last event + gap
    assert(s1.getAs[Timestamp]("window_end") == Timestamp.valueOf("2024-01-01 10:40:00"))
    val s2 = out(1)
    assert(s2.getAs[Long]("n_events") == 1)
    assert(s2.getAs[Double]("sum_value") == 10.0)
  }

  test("stream-stream interval join: key + time-bounded matches only") {
    implicit val sqlCtx = spark.sqlContext
    val trades = MemoryStream[(String, Timestamp, Double)]
    val quotes = MemoryStream[(String, Timestamp, Double)]
    val tDf = trades.toDS().toDF("stock_symbol", "local_time", "price")
    val qDf = quotes.toDS()
      .toDF("stock_symbol", "local_time", "quote")
      .withColumnRenamed("stock_symbol", "q_sym")
      .withColumnRenamed("local_time", "q_time")
    // rename key/time on the right to keep output columns unambiguous
    val joined = StreamingIndicators.intervalJoin(
      tDf,
      qDf.withColumnRenamed("q_sym", "stock_symbol")
        .withColumnRenamed("q_time", "local_time"),
      lookback = "5 minutes")
      .select(
        col("l.stock_symbol"), col("l.local_time").as("trade_time"),
        col("price"), col("r.local_time").as("quote_time"), col("quote"))

    val query = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_ij")
      .start()

    def ts(s: String) = Timestamp.valueOf(s)
    quotes.addData(Seq(
      ("AAA", ts("2024-01-01 10:00:00"), 99.0), // within 5m of the trade
      ("AAA", ts("2024-01-01 10:04:00"), 100.0), // within
      ("AAA", ts("2024-01-01 09:54:00"), 98.0), // too old
      ("AAA", ts("2024-01-01 10:06:00"), 101.0), // after the trade
      ("BBB", ts("2024-01-01 10:03:00"), 55.0))) // wrong key
    trades.addData(Seq(("AAA", ts("2024-01-01 10:05:00"), 100.5)))
    query.processAllAvailable()
    // advance both watermarks so results finalize
    quotes.addData(Seq(("AAA", ts("2024-01-01 11:00:00"), 1.0)))
    trades.addData(Seq(("ZZZ", ts("2024-01-01 11:00:00"), 1.0)))
    query.processAllAvailable()

    val got = spark.table("stream_ij")
      .filter(col("price") === 100.5).collect()
    query.stop()
    assert(got.map(_.getAs[Double]("quote")).sorted.toSeq == Seq(99.0, 100.0))
  }

  test("left-outer interval join defers the null row until the watermark closes the interval") {
    implicit val sqlCtx = spark.sqlContext
    val trades = MemoryStream[(String, Timestamp, Double)]
    val quotes = MemoryStream[(String, Timestamp, Double)]
    val tDf = trades.toDS().toDF("stock_symbol", "local_time", "price")
    val qDf = quotes.toDS().toDF("stock_symbol", "local_time", "quote")
      .withColumnRenamed("stock_symbol", "q_sym")
      .withColumnRenamed("local_time", "q_time")
    val joined = StreamingIndicators.intervalJoinOuter(
      tDf,
      qDf.withColumnRenamed("q_sym", "stock_symbol")
        .withColumnRenamed("q_time", "local_time"),
      lookback = "5 minutes", watermark = "10 minutes")
      .select(
        col("l.stock_symbol"), col("l.local_time").as("trade_time"),
        col("price"), col("quote"))
    val query = joined.writeStream.outputMode("append")
      .format("memory").queryName("stream_ijo").start()

    def ts(s: String) = Timestamp.valueOf(s)
    // a matched trade and an unmatched one, same batch
    quotes.addData(Seq(("AAA", ts("2024-01-01 10:00:00"), 99.0)))
    trades.addData(Seq(
      ("AAA", ts("2024-01-01 10:02:00"), 100.5), // matches the quote
      ("CCC", ts("2024-01-01 10:02:00"), 77.0))) // no quote ever
    query.processAllAvailable()
    // watermark has NOT passed the unmatched trade's interval: the null
    // row must not have been emitted yet (a quote could still arrive)
    val early = spark.table("stream_ijo").collect()
    assert(early.map(_.getAs[Double]("price")).toSet == Set(100.5))
    // advance event time well past the interval end on both sides
    quotes.addData(Seq(("AAA", ts("2024-01-01 11:00:00"), 1.0)))
    trades.addData(Seq(("ZZZ", ts("2024-01-01 11:00:00"), 1.0)))
    query.processAllAvailable()
    val late = spark.table("stream_ijo")
      .filter(col("price") === 77.0).collect()
    query.stop()
    assert(late.length == 1 && late.head.isNullAt(late.head.fieldIndex("quote")),
      "unmatched trade must emit exactly one null-padded row after the watermark")
  }

  test("kafka frame + json decode round-trip preserves the candle") {
    val df = StreamingIndicators.toKafkaFrame(
      spark.createDataset(Seq(
        graft.model.EnrichedCandle("AAA",
          Timestamp.valueOf("2024-01-01 00:00:00"), 1, 2, 0.5, 1.5, 100,
          None, None, None, None, None, None, None, None, None, "HOLD"))))
    val row = df.collect().head
    assert(row.getAs[String]("key") == "AAA")
    assert(row.getAs[String]("value").contains("\"signal\":\"HOLD\""))

    val raw = Seq(
      """{"stock_symbol":"BBB","local_time":"2024-01-01 00:01:00","open":1.0,"high":2.0,"low":0.5,"close":1.5,"volume":7.0}""")
      .toDF("value")
    val decoded = StreamingIndicators.decodeCandleJson(raw).collect().head
    assert(decoded.stock_symbol == "BBB")
    assert(decoded.close == 1.5)
  }
}

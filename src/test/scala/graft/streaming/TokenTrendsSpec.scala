package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.DocStream.DocEvent

/** Sharded streaming Misra-Gries: state persists across micro-batches,
  * and after the last batch every per-shard sketch satisfies the MG
  * bounds against exact per-shard counts (no lost heavy hitter,
  * estimates within [true - n_shard/k, true]).
  */
class TokenTrendsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cross-batch sketches keep every heavy hitter within MG bounds") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // skewed stream: 3 hot tokens + a 60-token tail, split over 3 batches
      val toks =
        Seq.fill(200)("alpha") ++ Seq.fill(150)("beta") ++
          Seq.fill(120)("gamma") ++ (0 until 600).map(i => s"t${i % 60}")
      val ordered = toks.zipWithIndex
        .sortBy { case (_, i) => (i * 2654435761L) % 8192 }.map(_._1)
      def doc(id: Long, ts: Int, ws: Seq[String]) =
        DocEvent(id, Timestamp.valueOf(f"2024-05-01 08:$ts%02d:00"), "en",
          ws.mkString(" "))
      val batches = ordered.grouped(ordered.size / 3 + 1).toSeq.zipWithIndex
        .map { case (ws, i) => doc(i.toLong, i, ws) }

      val shards = 4
      val k = 8
      val input = MemoryStream[DocEvent]
      val query = TokenTrends.trendingTokens(input.toDS(), shards, k)
        .writeStream.outputMode("append").format("memory")
        .queryName("token_trends").start()
      try {
        batches.foreach { b => input.addData(b); query.processAllAvailable() }

        // latest snapshot per shard = rows at that shard's max n_shard
        val rows = spark.table("token_trends").collect()
          .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_shard"),
            r.getAs[String]("tok"), r.getAs[Long]("est")))
        val latest = rows.groupBy(_._1).map { case (s, rs) =>
          val nMax = rs.map(_._2).max
          // est = 0 is the empty-sketch marker row, not an MG entry
          s -> (nMax, rs.filter(r => r._2 == nMax && r._4 > 0L)
            .map(r => r._3 -> r._4).toMap)
        }

        // exact per-shard truth, using the operator's own routing
        val shardOf = ordered.distinct.toDF("tok")
          .select(col("tok"), pmod(xxhash64(col("tok")), lit(shards.toLong)))
          .as[(String, Long)].collect().toMap
        val exact = ordered.groupBy(identity).map { case (t, xs) =>
          t -> xs.size.toLong
        }
        val nShardExact =
          ordered.groupBy(shardOf).map { case (s, xs) => s -> xs.size.toLong }

        for ((s, (n, sketch)) <- latest) {
          assert(n == nShardExact(s), s"shard $s processed-count drifted")
          assert(sketch.size <= k - 1)
          for ((t, c) <- exact if shardOf(t) == s && c > n / k)
            assert(sketch.contains(t), s"lost heavy hitter $t in shard $s")
          for ((t, est) <- sketch)
            assert(est <= exact(t) && est >= exact(t) - n / k,
              s"estimate for $t out of bounds")
        }
        // the globally-hot tokens survived wherever they were routed
        for (hot <- Seq("alpha", "beta", "gamma"))
          assert(latest(shardOf(hot))._2.contains(hot))
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

  test("windowed sketches keep windows independent across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def doc(id: Long, hour: Int, ws: Seq[String]) =
        DocEvent(id, Timestamp.valueOf(f"2024-05-03 $hour%02d:15:00"), "en",
          ws.mkString(" "))
      // "morning" is hot only in hour 8, "evening" only in hour 9;
      // hour-9 data arrives across TWO batches (state accumulates
      // within the window, not across windows)
      val b1 = Seq(
        doc(0, 8, Seq.fill(30)("morning") ++ (0 until 10).map(i => s"m$i")),
        doc(1, 9, Seq.fill(12)("evening")))
      val b2 = Seq(
        doc(2, 9, Seq.fill(18)("evening") ++ (0 until 8).map(i => s"e$i")))

      val input = MemoryStream[DocEvent]
      val query = TokenTrends
        .trendingTokensWindowed(input.toDS(), windowSeconds = 3600L,
          shards = 2, k = 6)
        .writeStream.outputMode("append").format("memory")
        .queryName("token_trends_w").start()
      try {
        input.addData(b1); query.processAllAvailable()
        input.addData(b2); query.processAllAvailable()
        val rows = spark.table("token_trends_w").collect()
          .map(r => (r.getAs[Long]("window_start"), r.getAs[Long]("shard"),
            r.getAs[Long]("n_shard"), r.getAs[String]("tok"), r.getAs[Long]("est")))
        val h8 = Timestamp.valueOf("2024-05-03 08:00:00").getTime / 1000
        val h9 = Timestamp.valueOf("2024-05-03 09:00:00").getTime / 1000
        def latest(win: Long) = rows.filter(_._1 == win).groupBy(_._2)
          .map { case (s, rs) =>
            val nMax = rs.map(_._3).max
            s -> (nMax, rs.filter(r => r._3 == nMax && r._5 > 0)
              .map(r => r._4 -> r._5).toMap)
          }
        val w8 = latest(h8); val w9 = latest(h9)
        // totals per window equal that window's token count
        assert(w8.values.map(_._1).sum == 40L, s"hour-8 totals: $w8")
        assert(w9.values.map(_._1).sum == 38L, s"hour-9 totals: $w9")
        // each hour's hot token is in ITS window only, with a full count
        // (no eviction pressure at these sizes: estimates are exact)
        val w8toks = w8.values.flatMap(_._2.keys).toSet
        val w9toks = w9.values.flatMap(_._2.keys).toSet
        assert(w8toks.contains("morning") && !w9toks.contains("morning"))
        assert(w9toks.contains("evening") && !w8toks.contains("evening"))
        assert(w9.values.flatMap(_._2.get("evening")).sum == 30L,
          "evening count must accumulate across batches within its window")
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

  test("sketch state survives a checkpoint restart (n_shard keeps counting)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_tt_ck").toString
      def doc(id: Long, ws: Seq[String]) =
        DocEvent(id, Timestamp.valueOf(f"2024-05-02 09:0$id:00"), "en",
          ws.mkString(" "))
      val b1 = doc(0, Seq.fill(40)("hot") ++ (0 until 30).map(i => s"a$i"))
      val b2 = doc(1, Seq.fill(25)("hot") ++ (0 until 20).map(i => s"b$i"))
      val input = MemoryStream[DocEvent]
      def startQuery() = TokenTrends.trendingTokens(input.toDS(), shards = 2, k = 6)
        .writeStream.outputMode("append")
        .format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ck")
        .start()

      val q1 = startQuery()
      input.addData(Seq(b1)); q1.processAllAvailable(); q1.stop()
      val q2 = startQuery()
      input.addData(Seq(b2)); q2.processAllAvailable(); q2.stop()

      val rows = spark.read.parquet(s"$base/out").collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_shard"),
          r.getAs[String]("tok"), r.getAs[Long]("est")))
      // totals after restart = ALL tokens ever processed, per shard
      val shardOf = (Seq("hot") ++ (0 until 30).map(i => s"a$i") ++
          (0 until 20).map(i => s"b$i")).distinct.toDF("tok")
        .select(col("tok"),
          pmod(xxhash64(col("tok")), lit(2L))).as[(String, Long)]
        .collect().toMap
      val all = Seq.fill(40)("hot") ++ (0 until 30).map(i => s"a$i") ++
        Seq.fill(25)("hot") ++ (0 until 20).map(i => s"b$i")
      val expectTotals = all.groupBy(shardOf).map { case (s, xs) => s -> xs.size.toLong }
      val gotTotals = rows.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).max }
      assert(gotTotals == expectTotals,
        s"per-shard totals after restart: $gotTotals != $expectTotals")
      // the cross-restart heavy hitter is still in its post-restart sketch
      val hotShard = shardOf("hot")
      val lastSketch = rows
        .filter(r => r._1 == hotShard && r._2 == gotTotals(hotShard))
      assert(lastSketch.exists(r => r._3 == "hot" && r._4 >= 65L - all.size / 6),
        s"hot token missing or underestimated after restart: ${lastSketch.toSeq}")
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

package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamingIndicators

/** End-to-end: the production [[HttpPoller]] against a REAL in-process
  * HTTP server (JDK `com.sun.net.httpserver`, localhost only) — the live
  * leg of the reference's poll loop (ingest.py:60-121) that previously
  * only had registry/file test pollers. The server publishes candle
  * payloads shaped exactly like ingest.py's Kafka payload; the stream
  * decodes them with the production `decodeCandleJson` path.
  */
class HttpPollSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  // ---- the fake exchange: a cursored candle feed over real HTTP ----
  private val feed = ArrayBuffer.empty[String]
  private def publish(recs: Seq[String]): Unit =
    feed.synchronized { feed ++= recs }

  private var server: HttpServer = _
  private var url: String = _

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/candles", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
          .split("&").filter(_.contains("="))
          .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
        val body: String = feed.synchronized {
          params.get("op") match {
            case Some("end") => feed.size.toString
            case Some("fetch") =>
              val since = params("since").toInt
              val max = params("max").toInt
              feed.slice(since, since + max).mkString("\n")
            case _ => ex.sendResponseHeaders(400, -1); ex.close(); return
          }
        }
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    url = s"http://127.0.0.1:${server.getAddress.getPort}/candles"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def candle(i: Int, sym: String = "BTCIRT"): String =
    s"""{"stock_symbol":"$sym","local_time":"2024-01-01 00:${f"$i%02d"}:00",""" +
      s""""open":${i}.0,"high":${i + 1}.0,"low":${i - 1}.0,""" +
      s""""close":${i}.5,"volume":7.0,"topic":"${sym.toLowerCase}_topic"}"""

  private def readHttp(extra: (String, String)*) = {
    val base = spark.readStream.format("graft-poll")
      .option("poller", classOf[HttpPoller].getName)
      .option("url", url)
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("HTTP feed -> PollSource -> decodeCandleJson, exactly once, " +
    "frontier growth observed across polls") {
    publish((1 to 6).map(candle(_)))
    val decoded = StreamingIndicators
      .decodeCandleJson(readHttp("maxPerPoll" -> "4").select("value"))
      .toDF()
    val query = decoded.writeStream.outputMode("append").format("memory")
      .queryName("http_poll_e2e").start()
    try {
      query.processAllAvailable()
      val closes = spark.table("http_poll_e2e")
        .collect().map(r => r.getAs[Double]("close")).sorted
      assert(closes.toSeq == (1 to 6).map(_ + 0.5))
      // admission control holds over real HTTP too
      val sizes = query.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(sizes.nonEmpty && sizes.forall(_ <= 4), sizes.toSeq.toString)
      // live frontier growth: publish while the query runs
      publish(Seq(candle(7), candle(8)))
      query.processAllAvailable()
      assert(spark.table("http_poll_e2e").count() == 8)
      assert(spark.table("http_poll_e2e")
        .select("stock_symbol").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("BTCIRT"))
    } finally query.stop()
  }

  test("restart from checkpoint replays [committed, end) from the " +
    "endpoint itself — no duplicates, no gaps") {
    val ckpt = Files.createTempDirectory("http_poll_ckpt").toString
    val out = Files.createTempDirectory("http_poll_out").toString
    def start() = readHttp("maxPerPoll" -> "3")
      .writeStream.outputMode("append").format("parquet")
      .option("checkpointLocation", ckpt).option("path", out).start()

    val before = feed.synchronized(feed.size)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    publish(Seq(candle(21, "ETHIRT"), candle(22, "ETHIRT")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val offsets = spark.read.parquet(out)
        .select("offset").collect().map(_.getLong(0)).sorted
      assert(offsets.toSeq == (0 until before + 2).map(_.toLong),
        "every cursor exactly once across the restart")
    } finally q2.stop()
  }

  test("non-200 endpoint fails the fetch loudly (after bounded retries)") {
    val bad = s"http://127.0.0.1:${server.getAddress.getPort}/nope"
    val opts = new java.util.HashMap[String, String]()
    opts.put("url", bad)
    opts.put("httptimeoutms", "2000")
    opts.put("httpretries", "1")
    val poller = new HttpPoller(opts)
    val e = intercept[java.io.IOException](poller.end())
    assert(e.getMessage.contains("404"))
  }
}

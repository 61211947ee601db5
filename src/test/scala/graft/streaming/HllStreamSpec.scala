package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.HllStream.Obs

/** Streaming HLL equals the batch sketch under SHUFFLED and DUPLICATED
  * delivery — registers merge by max, so no ordering contract is needed
  * at all (the strongest parity in the streaming tier) — on both a
  * synthetic stream and the real q_hll observation derivation.
  */
class HllStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def withRocks[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("rho ladder matches the batch integer comparison ladder") {
    import spark.implicits._
    val ws = Seq(0L, 1L, 2L, 3L, 255L, 256L, (1L << 51) - 1, 1L << 51,
      (1L << 52) - 1) ++ (0 until 60).map(i => (1L << 45) + i * 12345L)
    val batch = ws.toDF("w")
      .selectExpr(s"CAST(${graft.ops.Hll.rhoCase("w")} AS INT) AS r")
      .as[Int].collect().toSeq
    ws.map(HllStream.rho) shouldBe batch
  }

  test("stream ≡ batch under shuffled, duplicated, split delivery") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocks {
      import org.apache.spark.sql.functions._
      val obs = graft.model.Tables.events(spark, sfDir)
        .select(col("event_type").as("key"),
          expr("md5p60(CAST(user_id AS STRING))").as("h"))
      val batchMap = graft.ops.Hll.estimate(obs)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap

      val rows = obs.as[Obs].collect()
      val rnd = new scala.util.Random(5)
      // shuffle + duplicate a third of the rows: the sketch must not care
      val delivered = rnd.shuffle(
        (rows ++ rows.take(rows.length / 3)).toSeq)
      val input = MemoryStream[Obs]
      val q = HllStream.estimates(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("hll_stream").start()
      try {
        delivered.grouped(math.max(1, delivered.length / 5 + 1)).foreach { c =>
          input.addData(c)
          q.processAllAvailable()
        }
        // last emitted row per key is the live estimate
        val streamed = spark.table("hll_stream")
          .withColumn("rn", monotonically_increasing_id())
          .orderBy(col("rn"))
          .collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
          .toMap // later rows overwrite earlier ones per key
        streamed shouldBe batchMap
      } finally q.stop()
    }
  }
}

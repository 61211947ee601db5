package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.KmvStream.Obs

/** Streaming KMV equals the batch sketch under SHUFFLED and DUPLICATED
  * delivery — "K smallest distinct of the union" is a lattice merge,
  * so like HLL no ordering contract is needed; UNLIKE HLL the sketch
  * itself is value-exact, so parity is equality of (sk_size, kth_h,
  * est) with the batch q_kmv derivation on the same rows.
  */
class KmvStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  // transformWithState needs multiple column families -> RocksDB
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

  test("merge helper: k smallest distinct of the union, any split") {
    val rnd = new scala.util.Random(11)
    val xs = Array.fill(500)(rnd.nextLong().abs % 10000)
    val want = xs.distinct.sorted.take(graft.ops.Kmv.K).toSeq
    // fold in random chunkings — result must not depend on the split
    (1 to 5).foreach { seed =>
      val r2 = new scala.util.Random(seed)
      val shuffled = r2.shuffle(xs.toSeq)
      var sk = Array.empty[Long]
      shuffled.grouped(1 + r2.nextInt(90)).foreach { chunk =>
        sk = graft.ops.Kmv.merge(sk, chunk.iterator)
      }
      sk.toSeq shouldBe want
    }
  }

  test("stream ≡ batch q_kmv under shuffled, duplicated delivery") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocks {
    val batchMap = graft.SparkEntry.queries("q_kmv")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))) // sk_size, kth_h, est
      .toMap
    val rows = graft.model.Tables.events(spark, sfDir)
      .select(col("event_type").as("key"),
        expr("md5p60(cast(user_id as string))").as("h"))
      .as[Obs].collect()
    val rnd = new scala.util.Random(7)
    val delivered = rnd.shuffle((rows ++ rows.take(rows.length / 4)).toSeq)
    val input = MemoryStream[Obs]
    val q = KmvStream.estimates(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("kmv_stream").start()
    try {
      delivered.grouped(math.max(1, delivered.length / 5 + 1)).foreach { c =>
        input.addData(c)
        q.processAllAvailable()
      }
      val streamed = spark.table("kmv_stream")
        .withColumn("rn", monotonically_increasing_id())
        .orderBy(col("rn"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap // later rows overwrite earlier: final state per key
      streamed shouldBe batchMap
      spark.catalog.dropTempView("kmv_stream")
    } finally q.stop()
    }
  }
}

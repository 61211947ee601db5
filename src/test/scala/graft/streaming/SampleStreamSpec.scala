package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.SampleStream.{bottomK, Doc, SampleK}

/** The streaming bottom-k sample equals the batch hash-ordered rule
  * over every stream prefix, per group, across uneven micro-batches —
  * including batches that displace previously-kept items.
  */
class SampleStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("prefix-exact samples; later batches displace kept items") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = (0 until 300).map(i => Doc("G" + i % 2, 1000L + i))
      val batches =
        Seq(docs.take(40), docs.slice(40, 41), docs.drop(41))

      val input = MemoryStream[Doc]
      val query = SampleStream.samples(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("sample_stream").start()
      try {
        var fed = Seq.empty[Doc]
        var sawDisplacement = false
        var prevSamples = Map.empty[String, String]
        batches.foreach { c =>
          input.addData(c)
          query.processAllAvailable()
          fed = fed ++ c
          val latest = spark.table("sample_stream")
            .as[(String, Long, String)].collect()
            .groupBy(_._1).map { case (g, rows) => g -> rows.maxBy(_._2) }
          val ref = fed.groupBy(_.grp).map { case (g, rows) =>
            g -> ((rows.size.toLong,
              bottomK(rows.map(_.id)).sorted.mkString(",")))
          }
          c.map(_.grp).distinct.foreach { g =>
            val (n, ids) = ref(g)
            latest(g) shouldBe ((g, n, ids))
            if (prevSamples.get(g).exists(_ != ids)) sawDisplacement = true
            prevSamples += g -> ids
          }
        }
        // the test corpus must actually exercise displacement
        sawDisplacement shouldBe true
        // sample size caps at k
        prevSamples.values.foreach(
          _.split(",").length should be <= SampleK)
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

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.DecayStream.Ev

/** The streaming decayed score equals the batch [[graft.ops.Decay]]
  * fold over every stream prefix (days_ago measured from the key's own
  * last-active day) — across uneven micro-batches, including a batch
  * that ADVANCES the reference day and so re-weights all history.
  */
class DecayStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** Batch reference over a prefix: key-local day sums + the shared
    * in-memory fold (itself spec-pinned against Decay.decayedSum via
    * DecaySpec + the day-group quantization contract).
    */
  private def reference(evs: Seq[Ev]): Map[String, (Long, Long, Long, Long)] =
    evs.groupBy(_.key).map { case (k, g) =>
      val dayRaw = g.groupBy(_.day).map { case (d, rows) =>
        d -> rows.map(_.v).sum
      }
      val last = dayRaw.keys.max
      k -> ((g.size.toLong, g.map(_.v).sum, last,
        graft.ops.Decay.decayedOf(dayRaw, last)))
    }

  test("prefix-exact decayed scores across micro-batches with day advance") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(41)
      val evs = (0 until 240).map { i =>
        Ev("K" + i % 3, 20000L + (i / 30), rnd.nextInt(2000).toLong - 400L)
      }
      // batch 2 is a single row that advances K0's last day — every
      // stored day's weight changes on that emission
      val batches = Seq(
        evs.take(90), Seq(Ev("K0", 20060L, 500L)), evs.drop(90))

      val input = MemoryStream[Ev]
      val query = DecayStream.scores(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("decay_stream").start()
      try {
        var fed = Seq.empty[Ev]
        batches.foreach { c =>
          input.addData(c)
          query.processAllAvailable()
          fed = fed ++ c
          val ref = reference(fed)
          val latest = spark.table("decay_stream")
            .as[(String, Long, Long, Long, Long)].collect()
            .groupBy(_._1).map { case (k, rows) =>
              k -> rows.maxBy(_._2) // n_events grows monotonically
            }
          c.map(_.key).distinct.foreach { k =>
            val (n, raw, last, dec) = ref(k)
            latest(k) shouldBe ((k, n, raw, last, dec))
          }
        }
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

  test("day-advance re-weighting matches a from-scratch fold (no drift)") {
    // the state holds RAW day sums, so advancing the reference day must
    // reproduce the full recompute exactly — no compounding of floors
    val dayRaw = Map(100L -> 1000L, 101L -> -300L, 105L -> 40L)
    val atOld = graft.ops.Decay.decayedOf(dayRaw, 105L)
    val atNew = graft.ops.Decay.decayedOf(dayRaw, 110L)
    // independent hand fold at ref 110: w(10)=737421, w(9)=760228, w(5)=858733
    // 1000*737421/1e6 = 737; -300*760228/1e6 = -228 (trunc); 40*858733/1e6 = 34
    atNew shouldBe (737L - 228L + 34L)
    atOld should not be atNew
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Contract of the incremental rollup: folding deltas into the stored
  * summary reproduces the full recompute bit-for-bit, regardless of how
  * the history is sliced into batches or how many merge rounds happen.
  */
class RollupSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private lazy val events: DataFrame =
    graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"),
        to_date(col("ts")).as("day"), col("value"))

  private val keys = Seq("event_type", "day")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    Rollup.finish(df).collect().map(_.toSeq.toVector: Seq[Any]).toSet

  test("merge of arbitrary slices equals the one-shot summary bit-for-bit") {
    val full = Rollup.summarize(events, keys, "value")
    for (slices <- Seq(2, 5)) {
      val parts = (0 until slices).map(i =>
        Rollup.summarize(
          events.filter(pmod(col("event_id"), lit(slices)) === i), keys, "value"))
      rows(Rollup.merge(parts.head, parts.tail: _*)) shouldBe rows(full)
    }
  }

  test("sequential ingest (one delta at a time, many rounds) stays exact") {
    val full = Rollup.summarize(events, keys, "value")
    val deltas = (0 until 8).map(i =>
      Rollup.summarize(
        events.filter(pmod(col("event_id"), lit(8)) === i), keys, "value"))
    // snapshot absorbs one batch per round, like a nightly job
    val end = deltas.tail.foldLeft(deltas.head)((snap, d) => Rollup.merge(snap, d))
    rows(end) shouldBe rows(full)
  }

  test("derived view exposes avg from state without storing it") {
    val f = Rollup.finish(Rollup.summarize(events, keys, "value"))
    f.columns should contain allOf ("n", "sum_value", "avg_value", "min_value", "max_value")
    val r = f.filter(col("n") > 1).head()
    r.getAs[Double]("avg_value") shouldBe
      (r.getAs[Double]("sum_value") / r.getAs[Long]("n")) +- 1e-9
  }
}

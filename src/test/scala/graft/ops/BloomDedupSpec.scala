package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Exactness + plan contract of the bloom-gated incremental dedup: the
  * bloom may only ROUTE rows between the definitely-new path and the
  * exact-verify path — the result must equal the plain anti-join
  * bit-for-bit, and the verify joins must broadcast (nothing
  * corpus-sized shuffles).
  */
class BloomDedupSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("result equals the plain anti-join on constructed overlap") {
    val history = Seq((1L, "a"), (2L, "a"), (3L, "b"))
      .toDF("user_id", "event_type")
    val incoming = Seq(
      (10L, 1L, "a"), // dup pair
      (11L, 1L, "b"), // same user, new type
      (12L, 3L, "b"), // dup pair
      (13L, 4L, "a"), // new user
      (14L, 4L, "a")  // new pair appearing twice -> both rows kept
    ).toDF("event_id", "user_id", "event_type")
    val got = BloomDedup.newRows(history, incoming, Seq("user_id", "event_type"))
      .select("event_id").as[Long].collect().sorted
    got shouldBe Array(11L, 13L, 14L)
  }

  test("matches the anti-join exactly on driver events (10% history cut)") {
    val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
    val cut = ev.count() / 10
    val hist = ev.filter(col("event_id") < cut).select("user_id", "event_type")
    val inc = ev.filter(col("event_id") >= cut)
      .select("event_id", "user_id", "event_type")
    val expected = inc.join(hist, Seq("user_id", "event_type"), "left_anti")
      .select("event_id").as[Long].collect().sorted
    val got = BloomDedup.newRows(hist, inc, Seq("user_id", "event_type"))
      .select("event_id").as[Long].collect().sorted
    got shouldBe expected
  }

  test("no false negatives: every surviving key is genuinely absent from history") {
    val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
    val cut = ev.count() / 10
    val hist = ev.filter(col("event_id") < cut).select("user_id", "event_type")
    val inc = ev.filter(col("event_id") >= cut)
      .select("event_id", "user_id", "event_type")
    val survivors = BloomDedup.newRows(hist, inc, Seq("user_id", "event_type"))
    survivors.join(hist, Seq("user_id", "event_type"), "left_semi")
      .count() shouldBe 0L
  }

  test("oversized maybe-set falls back to the shuffled verify, same exact result") {
    val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
    val cut = ev.count() / 10
    val hist = ev.filter(col("event_id") < cut).select("user_id", "event_type")
    val inc = ev.filter(col("event_id") >= cut)
      .select("event_id", "user_id", "event_type")
    val expected = inc.join(hist, Seq("user_id", "event_type"), "left_anti")
      .select("event_id").as[Long].collect().sorted
    // force the fallback: every maybe-set bigger than 1 key overflows
    val got = BloomDedup.newRows(hist, inc, Seq("user_id", "event_type"),
      maxBroadcastKeys = 1L)
      .select("event_id").as[Long].collect().sorted
    got shouldBe expected
  }

  test("caller-supplied expectedItems skips the history count, result unchanged") {
    val history = Seq((1L, "a"), (2L, "a"), (3L, "b"))
      .toDF("user_id", "event_type")
    val incoming = Seq((10L, 1L, "a"), (11L, 1L, "b"), (13L, 4L, "a"))
      .toDF("event_id", "user_id", "event_type")
    // wildly oversized and undersized estimates both stay exact
    for (est <- Seq(1L, 1000000L)) {
      BloomDedup.newRows(history, incoming, Seq("user_id", "event_type"),
        expectedItems = Some(est))
        .select("event_id").as[Long].collect().sorted shouldBe Array(11L, 13L)
    }
  }

  test("verify joins broadcast: no sort-merge join, no shuffle of either side") {
    val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
    val cut = ev.count() / 10
    val hist = ev.filter(col("event_id") < cut).select("user_id", "event_type")
    val inc = ev.filter(col("event_id") >= cut)
      .select("event_id", "user_id", "event_type")
    val df = BloomDedup.newRows(hist, inc, Seq("user_id", "event_type"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    withClue(plan) {
      plan should not include "SortMergeJoin"
      plan should include("BroadcastHashJoin")
    }
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Join-view IVM equals the full recompute under adversarial delta
  * interleavings: left rows before their right match, both sides in
  * one step, duplicate join keys (counting semantics), empty deltas.
  */
class JoinIvmSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("incremental ≡ full recompute across interleaved deltas") {
    val a = Seq((1L, "hi", 10L), (1L, "hi", 20L), (2L, "lo", 30L),
      (3L, "hi", 40L), (4L, "lo", 50L))
      .toDF("k", "pri", "v")
    val b = Seq((1L, 100L), (1L, 101L), (2L, 200L), (3L, 300L))
      .toDF("k", "nat")
    // full recompute reference
    val full = a.join(b, "k")
      .groupBy("nat", "pri")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("total"))
      .orderBy("nat", "pri").collect().map(_.toSeq)
    // adversarial split: k=1 A rows land BEFORE any B side; k=3's B row
    // lands before its A row; k=1's second B duplicate in a later step;
    // one step has an empty A delta
    val steps = Seq(
      (a.filter($"v" <= 20), b.limit(0)),
      (a.filter($"v" === 30), b.filter($"nat" === 100 || $"nat" === 300)),
      (a.limit(0), b.filter($"nat" === 101 || $"nat" === 200)),
      (a.filter($"v" >= 40), b.limit(0)))
    val inc = JoinIvm.maintain(steps, "k", Seq("nat", "pri"),
      org.apache.spark.sql.functions.col("v"))
      .orderBy("nat", "pri").collect().map(_.toSeq)
    inc should contain theSameElementsInOrderAs full
    // unmatched A key 4 must appear nowhere
    inc.flatten.contains(50L) shouldBe false
  }
}

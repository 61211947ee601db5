package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** SA-span removal (ops.SaDedup): keep-earliest semantics on a corpus
  * with a known cross-doc repeat, passthrough for unique docs, the
  * n_chars = n_removed + len(clean_text) invariant, and determinism
  * across repartitionings.
  */
class SaDedupSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private val block = "0123456789abcdef" // the 16-char repeated span

  private def corpus() = {
    import spark.implicits._
    Seq(
      (1L, s"first has $block inside then qrstuv"),
      (2L, s"wxyz $block elsewhere KLMNOP"),
      (3L, "totally unique document with no repeats at all")
    ).toDF("id", "text")
  }

  test("later occurrence removed, earliest kept, unique doc untouched") {
    val out = SaDedup.clean(corpus(), minLen = 16, cap = 64)
      .orderBy("doc_id").collect()
    out.length shouldBe 3
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap

    // doc 1 holds the doc-order-first occurrence: untouched
    byId(1L)._2 shouldBe 0L
    byId(1L)._3 should include(block)
    // doc 2's copy is the victim: span excised, the rest survives
    byId(2L)._2 should be >= 16L
    byId(2L)._3 should not include block
    byId(2L)._3 should include("wxyz")
    byId(2L)._3 should include("KLMNOP")
    // doc 3 untouched
    byId(3L)._2 shouldBe 0L
    byId(3L)._3 shouldBe corpus().filter(col("id") === 3).head().getString(1)
    // length bookkeeping on every row
    out.foreach { r =>
      r.getLong(1) - r.getLong(2) shouldBe r.getString(3).length.toLong
    }
  }

  test("deterministic across repartitionings") {
    val a = SaDedup.clean(corpus(), minLen = 16, cap = 64)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val b = SaDedup.clean(corpus().repartition(7), minLen = 16, cap = 64)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    a shouldBe b
  }
}

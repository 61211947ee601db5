package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Suffix-array neighbor scan: planted cross-doc and within-doc repeats
  * are found, short repeats are not reported, the span cap truncates,
  * and results are repartition-invariant.
  */
class RepeatedSpansSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def find(docs: Seq[(Long, String)], minLen: Int = 16,
      cap: Int = 64) =
    RepeatedSpans.find(docs.toDF("id", "text"), minLen, cap)
      .as[(Long, Long, Long, Long, Long, String)].collect()

  private val noise1 = "qwrtpsdfghjklzxcvbnm0123456789QWRT"
  private val noise2 = "8765432109mnbvcxzlkjhgfdsaptrwqABC"

  test("a planted 30-char cross-doc repeat is found with its exact span") {
    val planted = "THE-QUICK-BROWN-FOX-JUMPS-OVER"
    planted.length shouldBe 30
    // four DISTINCT pads — the only cross-doc repeat is the plant
    val docs = Seq(
      (1L, "aqwzsxedcrfvtgbyhnujm" + planted + "plokmijnuhbygvtfcrdxe"),
      (2L, "0192837465abcdefghijk" + planted + "zyxwvutsrqponf1f2f3f4"))
    val got = find(docs)
    // the longest reported pair must be the planted span
    val best = got.maxBy(_._5)
    best._5 shouldBe 30
    best._6 shouldBe planted
    Set(best._1, best._3) shouldBe Set(1L, 2L)
    // positions point at the plant (1-based, pads are 21 chars)
    best._2 shouldBe 22
    best._4 shouldBe 22
  }

  test("repeats shorter than minLen are not reported") {
    val docs = Seq(
      (1L, "abcdefghij" + noise1), // shares only 10 chars
      (2L, "abcdefghij" + noise2))
    find(docs) shouldBe empty
  }

  test("a within-doc repeat is found") {
    val span = "REPEATED-SEGMENT-XYZ" // 20 chars
    val docs = Seq((1L, noise1 + span + noise2 + span + "END"))
    val got = find(docs)
    val best = got.maxBy(_._5)
    best._5 shouldBe 20
    best._6 shouldBe span
    best._1 shouldBe 1L
    best._3 shouldBe 1L
  }

  test("span_len caps at `cap` for arbitrarily long repeats") {
    val long = ("A-VERY-LONG-SHARED-BLOCK-" * 8).take(150)
    val docs = Seq((1L, noise1 + long), (2L, noise2 + long))
    val got = find(docs)
    got.map(_._5).max shouldBe 64
    // identical docs: every aligned suffix pair >= 16 chars reports
    val dup = Seq((3L, noise1 + noise2), (4L, noise1 + noise2))
    val g2 = find(dup)
    g2.count(r => Set(r._1, r._3) == Set(3L, 4L)) should be >= 40
  }

  test("bit-identical under repartitioning") {
    val rnd = new scala.util.Random(9)
    val block = "SHARED-BLOCK-FOR-EVERYONE"
    val docs = (1L to 30L).map { i =>
      val pad = (0 until 40).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      (i, pad + (if (i % 3 == 0) block else "") + pad.reverse)
    }
    val df = docs.toDF("id", "text")
    val a = RepeatedSpans.find(df).orderBy("doc_a", "pos_a", "doc_b", "pos_b")
      .collect()
    val b = RepeatedSpans.find(df.repartition(11))
      .orderBy("doc_a", "pos_a", "doc_b", "pos_b").collect()
    a should contain theSameElementsInOrderAs b
    a.length should be > 0
  }
}
